package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{name:sec,...}}.
  * local[32] + 32 shuffle partitions per the driver contract; a warm-up pass
  * on sf0.001 amortizes codegen/classload so per-query numbers measure the
  * plan, not JIT.
  *
  * Run isolation (round-2 bench triage): queries run alphabetically, so
  * the heavy dedup queries preceded the join queries and left behind (a)
  * a persisted shingle table occupying storage memory and (b) garbage
  * pressure — the join timings doubled with unchanged plans. Each query
  * now starts from a clean slate: `clearCache()` drops any persist the
  * previous query pinned and an explicit GC empties the young generation,
  * so per-query numbers measure the plan, not the predecessor's residue.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()

    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b runs a subset in a fresh JVM — the
    // isolation tool for separating session residue from real regressions
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown queries in SPARK_GRAFT_BENCH_ONLY: ${unknown.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // JIT/codegen warm-up on the smallest SF
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
    }
    spark.catalog.clearCache()
    val results = names.map { name =>
      System.gc()
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
