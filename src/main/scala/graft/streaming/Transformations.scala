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
    source.streamFromOldest()
      .flatMap(transform(_))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[StreamElement], _: Long) =>
        target.appendIdempotent(batch)
      }
      .start()
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

/** Proxy attributes: virtual attributes reading/writing through a backing
  * attribute with a bidirectional rename/transform
  * (reference: core/.../transform/ProxyTransform.java,
  * ElementWiseProxyTransform.java; config test-reference.conf:54-105).
  */
final case class ProxyAttribute(
    proxyPrefix: String,     // e.g. "proxied."
    backingPrefix: String) { // e.g. "raw."

  /** Rewrite a write to the proxy attribute into the backing attribute
    * (fromProxy / asElementWise write path).
    */
  def toBacking(e: StreamElement): StreamElement =
    if (e.attribute.startsWith(proxyPrefix))
      e.copy(attribute = backingPrefix + e.attribute.stripPrefix(proxyPrefix))
    else e

  /** Present a backing element as the proxy attribute (read path). */
  def toProxy(e: StreamElement): StreamElement =
    if (e.attribute.startsWith(backingPrefix))
      e.copy(attribute = proxyPrefix + e.attribute.stripPrefix(backingPrefix))
    else e

  /** Proxied read view of a changelog. */
  def readView(ds: org.apache.spark.sql.Dataset[StreamElement]): org.apache.spark.sql.Dataset[StreamElement] = {
    implicit val enc = StreamElement.encoder
    ds.map(toProxy)
  }
}
