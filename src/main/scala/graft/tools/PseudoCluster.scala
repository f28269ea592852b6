package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared scaffolding for the `local-cluster[W,C,M]` measurement tools
  * ([[ClusterBuild]], [[ClusterQuery]]): session construction with the
  * config-B executor JVM discipline, executor-registration wait, and the
  * external-pinning rendezvous. One definition so the build-side and
  * query-side measurement environments cannot silently diverge
  * (3rd-pass code-review r04). */
object PseudoCluster {
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  /** Build the pseudo-cluster session, wait for all W executors to
    * register (heap pre-touch happens at executor startup — outside any
    * timed work), then block on the SPARK_GRAFT_PINFILE rendezvous so
    * the harness can `taskset` every executor JVM before anything runs. */
  def session(workers: Int, cores: Int, memMB: Int, appName: String,
      logTag: String): SparkSession = {
    val totalCores = workers * cores
    val execMem = memMB - 1024 // headroom inside the worker budget
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    // executors are fresh JVMs launched from SPARK_HOME: they need our
    // classes on their classpath, the JDK17 module opens, and the same
    // GC discipline as the pinned single-JVM record (Xms=Xmx pre-touched
    // ParallelGC — BENCH/BASELINE.md §0a's config B). The harness passes
    // -XX:ActiveProcessorCount=C via EXTRAOPTS at executor LAUNCH so
    // GC/JIT pools match the executor budget (external taskset lands
    // after JVM boot, too late for thread-pool sizing).
    val classes = sys.env.getOrElse("SPARK_GRAFT_CLASSES",
      new java.io.File("target/scala-2.13/classes").getAbsolutePath)
    val extraOpts = sys.env.getOrElse("SPARK_GRAFT_EXEC_EXTRAOPTS", "")
    val spark = SparkSession.builder()
      .master(s"local-cluster[$workers,$cores,$memMB]")
      .appName(appName)
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
    val deadline = System.nanoTime() + 300e9.toLong
    while (spark.sparkContext.getExecutorMemoryStatus.size < workers + 1 &&
        System.nanoTime() < deadline) Thread.sleep(200)
    println(s"[$logTag] executors=${spark.sparkContext.getExecutorMemoryStatus.size - 1}")
    // external-pinning rendezvous: the harness pins each executor JVM to
    // its own core set (taskset -a -p) once they exist, then creates the
    // marker file; nothing after this (warmups included) runs before that
    sys.env.get("SPARK_GRAFT_PINFILE").foreach { pf =>
      println(s"[$logTag] waiting for pin marker $pf")
      val pinDeadline = System.nanoTime() + 180e9.toLong
      while (!new java.io.File(pf).exists() && System.nanoTime() < pinDeadline)
        Thread.sleep(200)
      // a silent fall-through would print an UNPINNED measurement in the
      // normal result format — exactly the contamination the rendezvous
      // exists to prevent. Mark it loudly so the harness/minima reader
      // can disqualify the sample (code-review r05).
      if (!new java.io.File(pf).exists())
        println(s"[$logTag] WARN: UNPINNED RUN - pin marker $pf never appeared")
    }
    spark
  }

  /** Deterministic rank-skewed retrieval mix (seed 99, 1-3 terms from
    * the 2000 most frequent vocab entries) — ONE definition shared by
    * [[graft.QueryScaling]] and [[ClusterQuery]] so their "same query
    * set" comparability holds by construction. */
  def queryMix(spark: SparkSession, n: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(99)
    val rows = (0 until n).map { i =>
      val k = 1 + rnd.nextInt(3)
      (i.toLong, Seq.fill(k)(graft.corpus.PageGen.vocab(rnd.nextInt(2000))))
    }
    spark.createDataFrame(rows).toDF("qid", "terms")
  }
}
