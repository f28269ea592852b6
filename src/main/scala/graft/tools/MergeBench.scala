package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.PageGen
import graft.index.{IndexBuilder, IndexMerger}

/** Merge-path cost comparison for BENCH/BASELINE.md: direct rebuild vs
  * general (re-encode) merge vs block-level concat merge over the same
  * two halves. Usage: runMain graft.tools.MergeBench [nDocs] [cores]. */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(400000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dps = math.max(1L, n / (cores * 2L))
    val half = (n / 2 / dps) * dps // shard-aligned split point
    val cfg = IndexBuilder.Config(docsPerShard = dps, blockSize = 256,
      buildTrigrams = false, partitions = cores * 2)
    val docs = PageGen.pages(spark, n, cores * 2).toDF().select("url", "text", "lang").cache()
    docs.count()
    // halves by url order == docId order
    val sorted = docs.orderBy("url").cache()
    sorted.count()
    // build parts from contiguous url ranges (split at the aligned point)
    val urls = sorted.select("url").collect().map(_.getString(0))
    val splitUrl = urls(half.toInt)
    import org.apache.spark.sql.functions.col
    val partsDf = Seq(docs.filter(col("url") < splitUrl), docs.filter(col("url") >= splitUrl))
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }
    def force(i: graft.index.BuiltIndex): Unit = {
      i.postings.count(); i.termstats.count(); i.docnorms.count(); i.docmap.count()
    }
    val (tParts, parts) = time {
      val ps = partsDf.map(df => IndexBuilder.build(spark, df, cfg).cache())
      ps.foreach(force); ps
    }
    require(IndexMerger.canConcat(parts, cfg), "split not aligned")
    // cache BEFORE force, like the parts above: an uncached index re-runs
    // the whole encode once per count() in force() (postings AND the
    // postings-derived termstats), overstating the rebuild/re-encode arms
    // ~2x vs the concat arm that counts cached parts (code-review r05)
    val (tDirect, _) = time { force(IndexBuilder.build(spark, docs, cfg).cache()) }
    val (tConcat, _) = time { force(IndexMerger.merge(spark, parts, cfg).cache()) }
    // general path: misalign by lying about nDocs? instead rebuild via the
    // occurrence re-encode entry point directly
    val (tGeneral, _) = time { force(IndexMerger.mergeGeneralForBench(spark, parts, cfg).cache()) }
    println(f"""{"n_docs":$n,"cores":$cores,"build_parts_sec":$tParts%.2f,""" +
      f""""direct_rebuild_sec":$tDirect%.2f,"concat_merge_sec":$tConcat%.2f,""" +
      f""""reencode_merge_sec":$tGeneral%.2f,""" +
      f""""concat_speedup_vs_rebuild":${tDirect / tConcat}%.1f,""" +
      f""""concat_speedup_vs_reencode":${tGeneral / tConcat}%.1f}""")
    spark.stop()
  }
}
