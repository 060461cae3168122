package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=q_a,q_b dumps a subset (local iteration on
    // new queries; the driver always runs the full set). A typo'd name
    // fails loudly — silently selecting nothing would let a stale outDir
    // "verify" a query that never ran.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown queries in SPARK_GRAFT_VERIFY_ONLY: ${unknown.mkString(", ")}")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // A failed dump must be visible to the driver as an `err` row, not a
        // silent omission indistinguishable from "not declared" (round-7:
        // 30 broken queries vanished from CORRECTNESS without a trace).
        // The marker lives INSIDE the query's outDir so any per-directory
        // scan sees it; the write above is mode=overwrite so a partial
        // parquet dir from the failed attempt is replaced, not merged.
        try {
          val dir = Paths.get(s"$outDir/$name")
          Files.createDirectories(dir)
          Files.writeString(dir.resolve("_ERROR"),
            Option(e.getMessage).getOrElse(e.getClass.getName).take(2000))
        } catch { case _: Throwable => () }
      }
      // per-query isolation: a query's persist() (e.g. the dedup
      // pipeline's shared shingle pass) must not occupy storage memory
      // for every query after it. releaseAll keeps the CachePins
      // registry in step — clearCache alone would orphan its handles
      graft.core.CachePins.releaseAll()
      spark.catalog.clearCache()
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonLine.str(k)}: ${JsonLine.str(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
