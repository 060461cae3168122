package graft.examples

import graft.{GraftSession, SparkEntry}

/** Plan auditor: prints formatted physical plans for selected queries so
  * pushdown/broadcast/codegen can be inspected (`runMain graft.examples
  * .Explain q_filter q_join ...`; no args = a headline set).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter", "q_get", "q1_agg", "q_join", "q_join_dims",
        "q_reduce_to_latest", "q_snapshot_compaction", "q_batch_updates_range")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
