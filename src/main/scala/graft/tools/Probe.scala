package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probes: isolate CPU-only vs shuffle vs encode phases at a
  * given core count. runMain graft.tools.Probe <cores> <nDocs> <phase>
  * Job phases: gen | tokenize | shuffle | encode.
  * Platform controls (plain threads, no Spark job): regcpu (registers
  * only — what the host CAN scale) | memcopy (DRAM stream) | jvmcpu
  * (alloc-heavy generate+tokenize) — the control suite BENCH/BASELINE.md
  * reports next to every scaling number.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val phase = args(2)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val pages = graft.corpus.PageGen.pages(spark, n, parallelism = cores * 4)
    val t0 = System.nanoTime()
    phase match {
      case "regcpu" =>
        // pure-register arithmetic, zero allocation: what the host CAN
        // scale. The gap between this and jvmcpu isolates the VM's
        // memory/allocation ceiling.
        val sum = new java.util.concurrent.atomic.AtomicLong(0)
        val iters = n * 2000
        val threads = (0 until cores).map { t =>
          new Thread(() => {
            var x = 0x9e3779b97f4a7c15L + t
            var i = 0L
            val per = iters / cores
            while (i < per) {
              x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
              x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
              i += 1
            }
            sum.addAndGet(x)
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        println("sum=" + sum.get())
      case "memcopy" =>
        // streaming memory bandwidth: copy large byte arrays
        val sum = new java.util.concurrent.atomic.AtomicLong(0)
        val threads = (0 until cores).map { t =>
          new Thread(() => {
            val src = new Array[Byte](1 << 20)
            val dst = new Array[Byte](1 << 20)
            java.util.Arrays.fill(src, t.toByte)
            var i = 0L
            val per = n / 100 / cores
            while (i < per) {
              System.arraycopy(src, 0, dst, 0, src.length)
              i += 1
            }
            sum.addAndGet(dst(0))
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        println("sum=" + sum.get())
      case "jvmcpu" =>
        // plain threads, no Spark: generation + tokenize
        val counter = new java.util.concurrent.atomic.AtomicLong(0)
        val sum = new java.util.concurrent.atomic.AtomicLong(0)
        val threads = (0 until cores).map { _ =>
          new Thread(() => {
            var i = counter.getAndIncrement()
            while (i < n) {
              val p = graft.corpus.PageGen.page(i)
              sum.addAndGet(graft.functions.Text.tokenize(p.text).length.toLong)
              i = counter.getAndIncrement()
            }
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        println("sum=" + sum.get())
      case "gen" =>
        println("sum=" + pages.map(_.text.length.toLong).reduce(_ + _))
      case "tokenize" =>
        println("sum=" + pages.map(p =>
          graft.functions.Text.tokenize(p.text).length.toLong).reduce(_ + _))
      case "shuffle" =>
        val toks = pages.flatMap { p =>
          val t = graft.functions.Text.tokenize(p.text)
          Iterator.tabulate(t.length)(i => (t(i), 0, 0, i))
        }.toDF("term", "shard", "doc", "pos")
        println("cnt=" + toks.repartition(cores * 4, col("term"))
          .sortWithinPartitions("term", "doc", "pos").count())
      case "encode" =>
        val withIds = pages.toDF().select("url", "text", "lang")
        val ids = graft.index.IndexBuilder.assignDocIds(spark, withIds, cores * 4)
        import spark.implicits._
        val docText = ids.map { case (id, _, text, _) => (id, text) }
        val blocks = graft.index.IndexBuilder.encodeTokenPostings(
          spark, docText, math.max(1L, n / (cores * 4L)),
          graft.index.IndexBuilder.Config(partitions = cores * 4))
        println("blocks=" + blocks.count())
      case other =>
        spark.stop()
        sys.error(s"unknown phase '$other' — see the scaladoc for the list")
    }
    println(f"[probe] cores=$cores n=$n phase=$phase sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
