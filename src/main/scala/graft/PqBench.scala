package graft

import org.apache.spark.sql.functions._

import graft.functions.{Ivf, Pq}
import graft.sources.Tables

/** PQ production-shape bench: separates the ONE-TIME artifact cost
  * (train codebooks, encode the corpus to m-byte codes, assign coarse
  * cells) from the PER-BATCH query cost served off the persisted
  * artifacts — the shape a 100 TB deployment runs, where the float
  * corpus is read exactly once at encode time and every query batch
  * scans only the compressed code table.
  *
  * The per-round BENCH numbers for q_pq_topk/q_ivf_pq_topk deliberately
  * retrain at query time (oracle determinism); this main reports the
  * split so the bench record shows which part of that cost is one-time.
  *
  * Prints ONE JSON line, metric "pq_production".
  */
object PqBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val emb = Tables.embeddings(spark, sfDir)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // one-time: train on a deterministic sample, encode + assign the
    // whole corpus, persist the artifacts (production would write them
    // to parquet; persist() measures the same single corpus pass)
    val (cb, trainSec) = timed {
      Pq.train(emb.filter(pmod(col("vec_id"), lit(10)) === 0),
        m = 8, k = 16, maxIter = 10)
    }
    val (coarse, coarseSec) = timed {
      Ivf.train(emb.filter(pmod(col("vec_id"), lit(10)) === 0),
        nCentroids = 16, maxIter = 5)
    }
    val ((codes, assigned), encodeSec) = timed {
      val c = Pq.encode(emb, cb).persist()
      val a = Ivf.assign(emb, coarse).persist()
      c.count(); a.count()
      (c, a)
    }

    // per-batch: three query batches against the SAME artifacts — only
    // the per-batch broadcasts (ADC tables, probe sets) are rebuilt
    val batchSecs = (0 until 3).map { b =>
      val pred = col("vec_id") >= b * 16L && col("vec_id") < b * 16L + 16L
      val (_, s1) = timed {
        Pq.searchTopK(emb, codes, pred, 10, cb).count()
      }
      val (_, s2) = timed {
        Pq.searchTopKIvf(emb, codes, assigned, pred, 10, cb, coarse,
          nProbe = 4).count()
      }
      (s1, s2)
    }
    val pq = batchSecs.map(_._1)
    val ivfpq = batchSecs.map(_._2)
    def fmt(xs: Seq[Double]): String = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"""{"metric":"pq_production","unit":"sec",""" +
      s""""train_sec":${f"$trainSec%.3f"},"coarse_train_sec":${f"$coarseSec%.3f"},""" +
      s""""encode_assign_sec":${f"$encodeSec%.3f"},""" +
      s""""pq_batch_secs":${fmt(pq)},"ivfpq_batch_secs":${fmt(ivfpq)},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
