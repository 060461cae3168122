package graft.tools

import graft.{GraftSession, SparkEntry}

/** One-off full-surface audit behind [[graft.tools.PartitionInvarianceSpec]]'s
  * in-suite slice: run EVERY query in [[SparkEntry.queries]] once at the
  * default local width (shuffle.partitions=4, AQE on) and once at a
  * co-prime width with AQE off (13, AQE off), and require bit-identical
  * canonical rows. Shuffle width is a deployment knob — thousands of
  * partitions at 100 TB — so any layout-dependence in a result is a
  * silent wrong-answer bug on a real cluster.
  *
  * Run: `sbt "runMain graft.tools.LayoutAudit /root/testdata/sf0.001"`.
  */
object LayoutAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    var failed = 0
    names.foreach { n =>
      def run(parts: String, aqe: String): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        try LocalClusterSmoke.canon(SparkEntry.queries(n)(spark, sfDir))
        catch { case e: Exception =>
          Seq(s"<threw ${e.getClass.getName}: ${e.getMessage}>") }
      }
      val base = run("4", "true")
      val wide = run("13", "false")
      val ok = wide == base
      if (!ok) failed += 1
      // an empty result equal on both sides proves nothing about layout —
      // mark it so the audit record distinguishes vacuous rows (e.g.
      // q_anti_join is legitimately empty at every sf: the synthetic
      // generator gives every customer an order; the driver oracle agrees)
      val verdict =
        if (ok && base.isEmpty) "MATCH (vacuous-empty)"
        else if (ok) "MATCH" else "DIVERGED"
      println(s"LAYOUT $n base=${base.size} wide=${wide.size} " +
        (if (ok) verdict else verdict +
          s" firstDiff=${wide.zipAll(base, "<missing>", "<missing>")
            .find(p => p._1 != p._2).map(p => s"wide:${p._1.take(120)} base:${p._2.take(120)}")
            .getOrElse("<sizes differ>")}"))
    }
    println(s"""{"audit":"layout-invariance","queries":${names.size},"failed":$failed}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
