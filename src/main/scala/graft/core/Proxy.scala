package graft.core

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

import graft.streaming.AttributeLogFamily

/** Element-wise attribute-NAME transform between a proxy attribute's
  * namespace and its raw (storage) namespace
  * (reference: core/src/main/java/cz/o2/proxima/core/transform/
  * ElementWiseProxyTransform.java:23 — fromProxy:163, toProxy:171, and the
  * identity:25 / composite:39 / renaming:68 / droppingUntilCharacter:91
  * factories).
  *
  * Name-only, value-preserving: proxies rename the attribute coordinate of
  * a [[StreamElement]]; payload bytes pass through untouched.
  */
trait ElementWiseProxyTransform extends Serializable {
  /** Proxy-namespace name → raw name (applied on WRITE through the proxy). */
  def fromProxy(proxy: String): String
  /** Raw name → proxy-namespace name (applied on READ through the proxy). */
  def toProxy(raw: String): String
}

/** A transform that can also run as pure Column expressions — the Spark
  * fast path: renames stay inside whole-stage codegen instead of dropping
  * to a deserializing `Dataset.map`. Implement when the rename is
  * expressible in `functions._` (the built-in factories all are).
  */
trait ColumnProxyTransform extends ElementWiseProxyTransform {
  def fromProxyColumn(proxy: Column): Column
  def toProxyColumn(raw: Column): Column
}

object ElementWiseProxyTransform {

  /** reference ElementWiseProxyTransform.identity:25 */
  val identity: ColumnProxyTransform = new ColumnProxyTransform {
    override def fromProxy(proxy: String): String = proxy
    override def toProxy(raw: String): String = raw
    override def fromProxyColumn(proxy: Column): Column = proxy
    override def toProxyColumn(raw: Column): Column = raw
  }

  /** Prefix rename between namespaces (reference renaming:68): names under
    * `proxy` map to `raw` and back; non-matching names pass through.
    */
  def renaming(proxy: String, raw: String): ColumnProxyTransform =
    new ColumnProxyTransform {
      override def fromProxy(s: String): String =
        if (s.startsWith(proxy)) raw + s.substring(proxy.length) else s
      override def toProxy(s: String): String =
        if (s.startsWith(raw)) proxy + s.substring(raw.length) else s
      override def fromProxyColumn(c: Column): Column =
        when(c.startsWith(lit(proxy)),
          concat(lit(raw), c.substr(lit(proxy.length + 1), length(c))))
          .otherwise(c)
      override def toProxyColumn(c: Column): Column =
        when(c.startsWith(lit(raw)),
          concat(lit(proxy), c.substr(lit(raw.length + 1), length(c))))
          .otherwise(c)
    }

  /** Left-to-right composition on toProxy, reversed on fromProxy
    * (reference composite:39). When every component supports the Column
    * fast path, so does the composition — otherwise a composite of two
    * renamings would silently demote every read/write to a deserializing
    * Dataset.map, the exact cost [[ColumnProxyTransform]] exists to avoid.
    */
  def composite(transforms: ElementWiseProxyTransform*): ElementWiseProxyTransform = {
    def from(proxy: String) =
      transforms.reverseIterator.foldLeft(proxy)((s, t) => t.fromProxy(s))
    def to(raw: String) =
      transforms.foldLeft(raw)((s, t) => t.toProxy(s))
    if (transforms.forall(_.isInstanceOf[ColumnProxyTransform]))
      new ColumnProxyTransform {
        private def cols = transforms.map(_.asInstanceOf[ColumnProxyTransform])
        override def fromProxy(proxy: String): String = from(proxy)
        override def toProxy(raw: String): String = to(raw)
        override def fromProxyColumn(proxy: Column): Column =
          cols.reverseIterator.foldLeft(proxy)((c, t) => t.fromProxyColumn(c))
        override def toProxyColumn(raw: Column): Column =
          cols.foldLeft(raw)((c, t) => t.toProxyColumn(c))
      }
    else
      new ElementWiseProxyTransform {
        override def fromProxy(proxy: String): String = from(proxy)
        override def toProxy(raw: String): String = to(raw)
      }
  }

  /** reference droppingUntilCharacter:91 — reads strip a routing prefix,
    * writes restore it.
    */
  def droppingUntilCharacter(character: Char, rawPrefix: String): ElementWiseProxyTransform =
    new ElementWiseProxyTransform {
      override def fromProxy(proxy: String): String = rawPrefix + proxy
      override def toProxy(raw: String): String = {
        val pos = raw.indexOf(character)
        if (pos > 0) raw.substring(pos + 1) else raw
      }
    }

  /** Instantiate a user transform by class name (the config's `apply:` —
    * reference ConfigRepository loads transform classes reflectively).
    */
  def forName(className: String): ElementWiseProxyTransform =
    Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[ElementWiseProxyTransform]
}

/** One direction of a proxy declaration: the raw target attribute it reads
  * from / writes into, and an optional explicit transform class (`apply:`);
  * absent ⇒ the prefix-renaming default
  * (reference test-reference.conf:105 `differentScheme { proxy: dummy }`).
  */
final case class ProxySide(target: String, transformClass: Option[String])

/** A parsed `proxy` block: symmetric (`proxy: "_e.*"`) sets both sides to
  * the same target; asymmetric (`proxy { read { from .. } write { into .. } }`)
  * may set either side alone (reference test-reference.conf:54-105,
  * ConfigRepository.loadProxiedFamilies:1889).
  */
final case class ProxySpec(read: Option[ProxySide], write: Option[ProxySide]) {
  def isReadProxy: Boolean = read.isDefined
  def isWriteProxy: Boolean = write.isDefined
  def isSymmetric: Boolean = read.isDefined && write.isDefined &&
    read.map(_.target) == write.map(_.target)
}

object Proxies {

  /** The wildcard prefix a name transform operates on: "event." for
    * "event.*", the full name for scalars (reference renaming proxies
    * operate on attribute prefixes).
    */
  private def prefixOf(attrName: String): String =
    if (attrName.endsWith(".*")) attrName.dropRight(1) else attrName

  /** Resolve a side's transform: explicit `apply:` class, else the
    * renaming default between the proxy's and the target's namespaces.
    */
  def transformOf(proxyAttr: String, side: ProxySide): ElementWiseProxyTransform =
    side.transformClass match {
      case Some(cls) => ElementWiseProxyTransform.forName(cls)
      case None =>
        ElementWiseProxyTransform.renaming(prefixOf(proxyAttr), prefixOf(side.target))
    }

  /** Read-side predicate: which RAW elements belong to this proxy — the
    * target's exact name (covers the "raw.*" wildcard-delete tombstone row
    * itself) or, for wildcard targets, any name under its prefix.
    */
  def readPredicate(side: ProxySide): Column = {
    val t = side.target
    if (t.endsWith(".*"))
      col("attribute").startsWith(t.dropRight(1)) || col("attribute") === t
    else col("attribute") === t
  }

  /** Apply a name transform over a changelog — Column fast path when the
    * transform supports it (stays in codegen), typed map otherwise.
    */
  def applyName(elems: Dataset[StreamElement], t: ElementWiseProxyTransform,
      toProxy: Boolean): Dataset[StreamElement] = t match {
    case c: ColumnProxyTransform =>
      val renamed = if (toProxy) c.toProxyColumn(col("attribute"))
                    else c.fromProxyColumn(col("attribute"))
      elems.toDF().withColumn("attribute", renamed).as[StreamElement](StreamElement.encoder)
    case _ =>
      val f: StreamElement => StreamElement =
        if (toProxy) e => e.copy(attribute = t.toProxy(e.attribute))
        else e => e.copy(attribute = t.fromProxy(e.attribute))
      elems.map(f)(StreamElement.encoder)
  }

  /** The proxy view over a raw family — the Spark-first analog of the
    * reference's generated proxy families
    * (ConfigRepository.loadProxiedFamilies:1889): reads filter the raw
    * family to the read-target's rows and rename raw→proxy; writes rename
    * proxy→raw and land in the write-target family. A side that is not
    * declared is rejected (reference: reading a write-only proxy throws).
    */
  def view(raw: AttributeLogFamily, proxyAttr: String, spec: ProxySpec): AttributeLogFamily =
    new ProxiedFamily(raw, proxyAttr, spec)
}

/** See [[Proxies.view]]. Filters BELOW the rename: the read predicate is on
  * the raw attribute name, so it pushes into the storage scan (parquet
  * row-group pruning) before any per-row rename work.
  */
final class ProxiedFamily(raw: AttributeLogFamily, proxyAttr: String,
    spec: ProxySpec) extends AttributeLogFamily {

  override def spark: org.apache.spark.sql.SparkSession = raw.spark

  // writes land in the raw family's storage — arbitration must use ITS
  // lock identity, or a proxy writer and a raw writer could interleave
  // commits on the same directory
  override def commitLockToken: String = raw.commitLockToken
  override def commitLockPath: Option[String] = raw.commitLockPath

  private def readSide: ProxySide = spec.read.getOrElse(
    throw new UnsupportedOperationException(
      s"proxy attribute $proxyAttr is write-only — no read transform declared"))

  private def writeSide: ProxySide = spec.write.getOrElse(
    throw new UnsupportedOperationException(
      s"proxy attribute $proxyAttr is read-only — no write transform declared"))

  private def readView(elems: Dataset[StreamElement]): Dataset[StreamElement] = {
    val side = readSide
    Proxies.applyName(
      elems.filter(Proxies.readPredicate(side)),
      Proxies.transformOf(proxyAttr, side), toProxy = true)
  }

  override def batchUpdates(from: Long, until: Long): Dataset[StreamElement] =
    readView(raw.batchUpdates(from, until))

  override def streamFromOldest(): Dataset[StreamElement] =
    readView(raw.streamFromOldest())

  override def append(elems: Dataset[StreamElement]): Unit =
    raw.append(Proxies.applyName(elems,
      Proxies.transformOf(proxyAttr, writeSide), toProxy = false))
}
