package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.IndexBuilder

/** One timed index build on a `local-cluster[W,C,M]` pseudo-cluster: W
  * SEPARATE executor JVMs with C cores and their own M-MiB heap each —
  * the multi-executor axis the north rule's "N vs 4N executors" gate
  * names, which a single `local[N]` JVM cannot test (one shared heap/GC
  * subsidizes the low level; BENCH/BASELINE.md §0a). Workers fork real
  * `CoarseGrainedExecutorBackend` processes, so each executor brings its
  * own GC threads, allocation areas and JIT state, exactly like a
  * standalone cluster — only DRAM stays shared (that residual is bounded
  * by the memcopy platform control).
  *
  *   runMain graft.tools.ClusterBuild <workers> <coresPerWorker> <memMB> <corpusDir> [tag]
  *
  * Requires SPARK_HOME=/opt/spark (worker launches executors from it)
  * and SPARK_WORKER_DIR on tmpfs. Pin externally with
  * `taskset -c 0..(W*C-1)` like BuildOnce. Prints one line:
  * [clusterbuild] tag=... workers=W cores=C total_sec=...
  */
object ClusterBuild {
  def main(args: Array[String]): Unit = {
    val workers = args(0).toInt
    val cores = args(1).toInt
    val memMB = args(2).toInt
    val corpusDir = args(3)
    val tag = args.lift(4).getOrElse("run")
    val totalCores = workers * cores
    val nHigh = sys.env.getOrElse("SPARK_GRAFT_NHIGH", "16").toInt
    val execMem = memMB - 1024 // headroom inside the worker budget
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    // executors are fresh JVMs launched from SPARK_HOME: they need our
    // classes on their classpath, the JDK17 module opens, and the same
    // GC discipline as the pinned single-JVM record (Xms=Xmx pre-touched
    // ParallelGC — BENCH/BASELINE.md §0a's config B)
    val classes = sys.env.getOrElse("SPARK_GRAFT_CLASSES",
      new java.io.File("target/scala-2.13/classes").getAbsolutePath)
    // per-level JVM sizing: the harness passes -XX:ActiveProcessorCount=C
    // here so GC/JIT thread pools match the EXECUTOR's core budget, not
    // the 32-vCPU host — external `taskset -a -p` lands only after the
    // JVM booted, too late for thread-pool sizing (the G1-under-taskset
    // artifact of BENCH/BASELINE.md §0a, solved at the root this time)
    val extraOpts = sys.env.getOrElse("SPARK_GRAFT_EXEC_EXTRAOPTS", "")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master(s"local-cluster[$workers,$cores,$memMB]")
      .appName(s"graft-clusterbuild-${workers}x$cores")
      .config("spark.executor.memory", s"${execMem}m")
      .config("spark.executor.extraClassPath", classes)
      .config("spark.executor.extraJavaOptions",
        s"$addOpens -Xms${execMem}m -XX:+AlwaysPreTouch -XX:+UseParallelGC $extraOpts")
      .config("spark.sql.shuffle.partitions", (totalCores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // wait for every executor to register (heap pre-touch happens at
    // executor startup — outside the timed builds)
    val deadline = System.nanoTime() + 300e9.toLong
    while (spark.sparkContext.getExecutorMemoryStatus.size < workers + 1 &&
        System.nanoTime() < deadline) Thread.sleep(200)
    println(s"[clusterbuild] executors=${spark.sparkContext.getExecutorMemoryStatus.size - 1}")
    // external-pinning rendezvous: the harness pins each executor JVM to
    // its own core set (taskset -a -p) once they exist, then creates the
    // marker file; nothing below (warmup included) runs before that
    sys.env.get("SPARK_GRAFT_PINFILE").foreach { pf =>
      println(s"[clusterbuild] waiting for pin marker $pf")
      val pinDeadline = System.nanoTime() + 180e9.toLong
      while (!new java.io.File(pf).exists() && System.nanoTime() < pinDeadline)
        Thread.sleep(200)
    }

    val docs = spark.read.parquet(corpusDir)
    val nDocs = docs.count()
    // shards per HIGH-level core (same absolute shard count at both levels
    // of a pair — identical work discipline). Default 8: shards >> tasks,
    // so hash-assigning shards to encode tasks balances (at shards ~=
    // tasks, balls-into-bins leaves ~1/e tasks empty and 2-3x stragglers —
    // and production sizes shards to task memory, far more than 2/core).
    val spc = sys.env.getOrElse("SPARK_GRAFT_SHARDS_PER_CORE", "8").toInt
    val cfg = IndexBuilder.Config(
      docsPerShard = math.max(1L, nDocs / (nHigh.toLong * spc)),
      blockSize = 256, buildTrigrams = false, partitions = totalCores * 2)
    def buildTo(out: String): Double = {
      val t0 = System.nanoTime()
      IndexBuilder.buildPersistent(spark, docs, out, cfg,
        (st, sec) => println(f"[clusterbuild] stage=$st sec=$sec%.2f"))
      (System.nanoTime() - t0) / 1e9
    }
    def tmp(): String = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm/graft-spark"), "cb").toString
    // warmup: JIT + classloading in every executor JVM. A smaller warmup
    // corpus (SPARK_GRAFT_WARMUP_CORPUS) keeps the warmup cost bounded
    // when the measured corpus is large — JIT doesn't need the full set.
    val warmDocs = sys.env.get("SPARK_GRAFT_WARMUP_CORPUS")
      .map(d => spark.read.parquet(d)).getOrElse(docs)
    val w = tmp()
    val tw = System.nanoTime()
    IndexBuilder.buildPersistent(spark, warmDocs, w, cfg, (_, _) => ())
    println(f"[clusterbuild] warmup_sec=${(System.nanoTime() - tw) / 1e9}%.2f")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(w))
    val out = tmp()
    val sec = buildTo(out)
    println(f"[clusterbuild] tag=$tag workers=$workers cores=$cores " +
      f"total_sec=$sec%.2f docs_per_sec=${nDocs / sec}%.1f")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }
}
