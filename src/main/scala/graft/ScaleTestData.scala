package graft

/** One-off scratch scaler for scale-SHAPE audits: rescale an existing
  * fixture directory by N copies with [[EnduranceBench.generate]]'s
  * shape-preserving rules (dims stay 1×, fact keys stride apart, doc
  * text re-tokenizes per copy, embeddings replicate as-is).
  *
  * The audit itself is `Bench` pointed at the output:
  * {{{
  * sbt "runMain graft.ScaleTestData /tmp/graft-sf1 /tmp/graft-sf10 10 100000000000"
  * SPARK_GRAFT_SF_DIR=/tmp/graft-sf10 SPARK_GRAFT_BENCH_ONLY=q_dedup_pipeline,...
  *   sbt "runMain graft.Bench"
  * }}}
  * The keyOff argument must exceed every key already present in the base
  * (rescaling sf1 needs a stride above its own 10⁹-spaced copies).
  */
object ScaleTestData {
  def main(args: Array[String]): Unit = {
    val Array(base, out, nCopies, keyOff) = args
    val spark = GraftSession.local()
    val t0 = System.nanoTime()
    EnduranceBench.generate(spark, base, out, nCopies.toInt, keyOff.toLong)
    println(s"""{"scaled":"$out","base":"$base","copies":$nCopies,""" +
      s""""sec":${(System.nanoTime() - t0) / 1e9}}""")
    spark.stop()
  }
}
