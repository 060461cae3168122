package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.StreamElement

/** Declarative element-wise transformations and replication — the
  * reference's config-declared continuous pipelines
  * (reference: core/.../transform/ElementWiseTransformation.java:29 — apply
  * (element, collector), example EventDataToUserHistory.java:51; replication
  * controller direct/ingest-server/.../ReplicationController.java).
  *
  * A transformation is a continuous query: readStream(source family) →
  * flatMap(transform) → idempotent append into the target family. The same
  * `flatMap` runs in batch mode for backfills — identical code path, which
  * is the stream-table duality the reference builds everything on.
  */
object Transformations {

  /** Element-wise 1:N transformation (ElementWiseTransformation.apply:51 —
    * the Collector becomes the returned Seq).
    */
  trait ElementWise extends Serializable {
    def apply(element: StreamElement): Seq[StreamElement]
  }

  /** Run continuously: source commit log → transform → target family.
    * The write IS idempotent-by-uuid ([[AttributeLogFamily
    * .appendIdempotent]]): a micro-batch replayed after a restart
    * between target write and checkpoint commit cannot duplicate rows
    * in the target.
    */
  def run(source: AttributeLogFamily, target: AttributeLogFamily,
      transform: ElementWise, checkpoint: String): StreamingQuery = {
    implicit val enc = StreamElement.encoder
    StreamConf.scoped(source.streamFromOldest().flatMap(transform(_))) { ds =>
      ds.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: Dataset[StreamElement], _: Long) =>
          target.appendIdempotent(batch)
        }
        .start()
    }
  }

  /** Batch backfill of the same transformation. */
  def backfill(source: AttributeLogFamily, target: AttributeLogFamily,
      transform: ElementWise): Unit = {
    implicit val enc = StreamElement.encoder
    target.append(source.batchUpdates().flatMap(transform(_)))
  }

  /** Replication: primary family → replica family, identity transform
    * (config `type: replica` families, ConfigRepository.java:1145).
    */
  def replicate(source: AttributeLogFamily, target: AttributeLogFamily,
      checkpoint: String): StreamingQuery =
    run(source, target, (e: StreamElement) => Seq(e), checkpoint)
}

// Proxy attributes moved to graft.core: config-parsed ProxySpec
// (core/Repository), ElementWiseProxyTransform factories + Column fast
// path, and the ProxiedFamily view (core/Proxy.scala).
