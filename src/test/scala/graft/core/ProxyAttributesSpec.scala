package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.CommitLogFamily

/** Test transform with the reference's EventTransform shape — loaded
  * reflectively through the config's `apply:` key.
  */
class UppercasingProxy extends ElementWiseProxyTransform {
  override def fromProxy(proxy: String): String = proxy.toLowerCase
  override def toProxy(raw: String): String = raw.toUpperCase
}

/** Proxy attributes: virtual attributes with read/write name transforms
  * (reference: core/.../transform/ElementWiseProxyTransform.java,
  * ProxyTransform.java; config shape test-reference.conf:54-105; loading
  * ConfigRepository.loadProxiedFamilies:1889; behavior
  * ElementWiseProxyTransformTest.java).
  */
class ProxyAttributesSpec extends SparkSpec {

  // the reference's proxied-attributes config section, re-expressed
  // (test-reference.conf:40-110): symmetric, asymmetric, explicit-scheme
  // asymmetric, write-only, and default-renaming variants
  private val config =
    """
      |entities {
      |  proxied {
      |    attributes {
      |      "_e.*":  { scheme: bytes }
      |      "raw.*": { scheme: bytes }
      |      "ints.*" { scheme: integer }
      |      "dummy": { scheme: bytes }
      |      "event.*": {
      |        proxy: "_e.*"
      |        apply: graft.core.UppercasingProxy
      |      }
      |      "asymmetric.*": {
      |        proxy {
      |          write { into: "_e.*",  apply: graft.core.UppercasingProxy }
      |          read  { from: "raw.*", apply: graft.core.UppercasingProxy }
      |        }
      |      }
      |      "schemeAsymmetric.*" {
      |        proxy {
      |          write { into: "_e.*",  apply: graft.core.UppercasingProxy }
      |          read  { from: "ints.*", apply: graft.core.UppercasingProxy }
      |        }
      |        scheme: float
      |      }
      |      "writeAsymmetric.*" {
      |        proxy {
      |          write { into: "_e.*", apply: graft.core.UppercasingProxy }
      |        }
      |        scheme: bytes
      |      }
      |      differentScheme {
      |        proxy: dummy
      |        scheme: integer
      |      }
      |    }
      |  }
      |}
      |attributeFamilies {
      |  proxied-all { entity: proxied, attributes: ["*"],
      |    storage: "inmem:///proxied", type: primary,
      |    access: [commit-log, batch-updates] }
      |}
      |""".stripMargin

  private val repo = Repository.parse(config)
  private def attr(n: String) = repo.entity("proxied").attribute(n).get

  test("symmetric proxy parses: both sides share the target") {
    val p = attr("event.*").proxy.get
    assert(p.isSymmetric && p.isReadProxy && p.isWriteProxy)
    assert(p.read.get.target == "_e.*" && p.write.get.target == "_e.*")
    assert(p.read.get.transformClass.contains("graft.core.UppercasingProxy"))
    // scheme inherited from the read target (reference: proxy takes the
    // proxied attribute's scheme)
    assert(attr("event.*").scheme == "bytes")
    assert(attr("event.*").isProxy && !attr("raw.*").isProxy)
  }

  test("asymmetric proxy parses: distinct read-from and write-into") {
    val p = attr("asymmetric.*").proxy.get
    assert(!p.isSymmetric && p.isReadProxy && p.isWriteProxy)
    assert(p.read.get.target == "raw.*" && p.write.get.target == "_e.*")
  }

  test("explicit scheme wins over the read target's") {
    assert(attr("schemeAsymmetric.*").scheme == "float")
    assert(attr("differentScheme").scheme == "integer")
  }

  test("write-only proxy parses and rejects reads") {
    val p = attr("writeAsymmetric.*").proxy.get
    assert(p.isWriteProxy && !p.isReadProxy)
    val fam = new CommitLogFamily(spark,
      java.nio.file.Files.createTempDirectory("graft-proxy-wo").toString + "/log")
    val view = Proxies.view(fam, "writeAsymmetric.*", p)
    intercept[UnsupportedOperationException](view.batchUpdates())
  }

  test("default renaming transform when `apply` is absent") {
    val p = attr("differentScheme").proxy.get
    val t = Proxies.transformOf("differentScheme", p.read.get)
    assert(t.fromProxy("differentScheme") == "dummy")
    assert(t.toProxy("dummy") == "differentScheme")
  }

  // ---- transform factory laws (ElementWiseProxyTransformTest.java) ----

  test("renaming maps prefixes both ways; non-matching passes through") {
    val t = ElementWiseProxyTransform.renaming("event.", "_e.")
    assert(t.fromProxy("event.abc") == "_e.abc")
    assert(t.toProxy("_e.abc") == "event.abc")
    assert(t.fromProxy("other.x") == "other.x")
    assert(t.toProxy("other.x") == "other.x")
    // the wildcard-delete tombstone row renames too
    assert(t.toProxy("_e.*") == "event.*")
  }

  test("composite applies left-to-right on toProxy, reversed on fromProxy") {
    val a = ElementWiseProxyTransform.renaming("b.", "a.")
    val b = ElementWiseProxyTransform.renaming("c.", "b.")
    val t = ElementWiseProxyTransform.composite(a, b)
    assert(t.toProxy("a.x") == "c.x")
    assert(t.fromProxy("c.x") == "a.x")
  }

  test("droppingUntilCharacter strips on read, restores on write") {
    val t = ElementWiseProxyTransform.droppingUntilCharacter('$', "prefix$")
    assert(t.toProxy("prefix$status") == "status")
    assert(t.fromProxy("status") == "prefix$status")
    assert(t.toProxy("nodollar") == "nodollar")
  }

  test("Column fast path is bit-identical to the string transform") {
    val s = spark
    import s.implicits._
    val t = ElementWiseProxyTransform.renaming("event.", "_e.")
    val names = Seq("_e.abc", "_e.*", "_e.", "other", "event.x", "_evnot")
    val viaCol = names.toDF("attribute")
      .select(t.toProxyColumn(col("attribute"))).as[String].collect().toSeq
    assert(viaCol == names.map(t.toProxy))
    val back = names.toDF("attribute")
      .select(t.fromProxyColumn(col("attribute"))).as[String].collect().toSeq
    assert(back == names.map(t.fromProxy))
  }

  // ---- end-to-end through a real family ----

  test("reads rename raw→proxy, writes land raw, round-trip preserves data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-proxy-e2e").toString
    val fam = new CommitLogFamily(spark, s"$dir/log")
    val p = ProxyAttributesSpec.renamingSpec("_e.*")
    val view = Proxies.view(fam, "event.*", p)

    // write through the proxy: names arrive in proxy namespace
    view.append(Seq(
      StreamElement.upsert("proxied", "k1", "event.a", "u1", 10L, Array[Byte](1)),
      StreamElement.upsert("proxied", "k1", "event.b", "u2", 20L, Array[Byte](2)),
      StreamElement.upsert("proxied", "k2", "status", "u3", 30L, Array[Byte](3))))

    // raw storage holds RAW names ("status" passes through untouched)
    val rawNames = fam.batchUpdates().collect().map(_.attribute).sorted.toSeq
    assert(rawNames == Seq("_e.a", "_e.b", "status"))

    // the proxy read view renames back — and FILTERS to its target, so
    // the non-proxied "status" row is invisible through the proxy
    val viaProxy = view.batchUpdates().collect().sortBy(_.attribute)
    assert(viaProxy.map(_.attribute).toSeq == Seq("event.a", "event.b"))
    assert(viaProxy.map(_.value(0)).toSeq == Seq(1.toByte, 2.toByte))

    // wildcard delete written through the proxy tombstones the raw rows
    view.append(Seq(StreamElement.deleteWildcard(
      "proxied", "k1", "event.", "u4", 40L)))
    assert(fam.batchUpdates().filter(_.deleteWildcard)
      .collect().map(_.attribute).toSeq == Seq("_e.*"))
    assert(view.batchSnapshot().filter(e => !e.isDelete).collect().isEmpty)
  }

  test("operator routing: proxy attrs read/write transparently from config") {
    // the reference shape: proxy declared in config, no explicit
    // Proxies.view anywhere — the operator routes it
    // (ConfigRepository.loadProxiedFamilies:1889)
    val opRepo = Repository.parse(
      """entities { proxied { attributes {
        |  "_e.*":  { scheme: bytes }
        |  "event.*": { proxy: "_e.*" }
        |  "ro.*": { proxy { read { from: "_e.*" } } }
        |} } }
        |attributeFamilies {
        |  p-primary { entity: proxied, attributes: [ "*" ],
        |    storage: "inmem://proxied-op", type: primary,
        |    access: [ commit-log, batch-updates, batch-snapshot, random-access ] }
        |}""".stripMargin)
    val op = new GraftOperator(spark, opRepo)

    // write addressed to the PROXY namespace lands under the raw name
    op.write(StreamElement.upsert("proxied", "k1", "event.a", "w1", 10L,
      Array[Byte](7)))
    val rawNames = op.getBatchUpdates("proxied")
      .collect().map(_.attribute).toSeq
    assert(rawNames == Seq("_e.a"),
      s"stored names must be raw (and the whole-entity default must not " +
        s"double-read through proxies): $rawNames")

    // reads through the proxy rename back; random access too
    assert(op.getBatchUpdates("proxied", attrs = Seq("event.*"))
      .collect().map(_.attribute).toSeq == Seq("event.a"))
    val got = op.getRandomAccess("proxied", "event.a").get("k1", "event.a")
    assert(got.exists(_.value.headOption.contains(7.toByte)))

    // distributed batch write: proxy rows renamed, raw rows untouched
    op.writeBatch(spark.createDataset(Seq(
      StreamElement.upsert("proxied", "k2", "event.b", "w2", 20L, Array[Byte](8)),
      StreamElement.upsert("proxied", "k2", "_e.c", "w3", 30L, Array[Byte](9))))(
      StreamElement.encoder))
    val all = op.getBatchUpdates("proxied").collect().map(_.attribute).sorted.toSeq
    assert(all == Seq("_e.a", "_e.b", "_e.c"), all.toString)

    // read-only proxy: reads serve, writes reject
    assert(op.getBatchUpdates("proxied", attrs = Seq("ro.*"))
      .collect().map(_.attribute).sorted.toSeq == Seq("ro.a", "ro.b", "ro.c"))
    intercept[UnsupportedOperationException](
      op.write(StreamElement.upsert("proxied", "k3", "ro.x", "w4", 40L,
        Array[Byte](1))))
  }

  test("writeBatch honors resolve precedence, proxy chains, and dedupe") {
    val opRepo = Repository.parse(
      """entities { proxied { attributes {
        |  "_c.*": { scheme: bytes }
        |  "b.*":  { proxy: "_c.*" }
        |  "a.*":  { proxy: "b.*" }
        |  "a.special": { scheme: bytes }
        |} } }
        |attributeFamilies {
        |  p2 { entity: proxied, attributes: [ "*" ],
        |    storage: "inmem://proxied-op2", type: primary,
        |    access: [ commit-log, batch-updates ] }
        |}""".stripMargin)
    val op = new GraftOperator(spark, opRepo)
    op.writeBatch(spark.createDataset(Seq(
      // chained: a.x -> b.x -> _c.x
      StreamElement.upsert("proxied", "k", "a.x", "u1", 1L, Array[Byte](1)),
      // exact-declared scalar under the a.* wildcard: resolve precedence
      // says it is its OWN attribute — must NOT be renamed
      StreamElement.upsert("proxied", "k", "a.special", "u2", 2L, Array[Byte](2)),
      // already-raw row passes through
      StreamElement.upsert("proxied", "k", "_c.y", "u3", 3L, Array[Byte](3))))(
      StreamElement.encoder))
    val stored = op.getBatchUpdates("proxied").collect()
      .map(_.attribute).sorted.toSeq
    assert(stored == Seq("_c.x", "_c.y", "a.special"), stored.toString)
    // the singular path agrees on the chain
    op.write(StreamElement.upsert("proxied", "k", "a.z", "u4", 4L, Array[Byte](4)))
    assert(op.getBatchUpdates("proxied").collect().map(_.attribute).sorted.toSeq
      == Seq("_c.x", "_c.y", "_c.z", "a.special"))
    // a twice-requested proxy attribute reads once, not twice
    val viaProxy = op.getBatchUpdates("proxied", attrs = Seq("b.*", "b.*"))
      .collect().map(_.attribute).sorted.toSeq
    assert(viaProxy == Seq("b.x", "b.y", "b.z"),
      s"duplicate attr request must not duplicate rows: $viaProxy")
  }

  test("commit-log subscription through the proxy renames and filters too") {
    val dir = java.nio.file.Files.createTempDirectory("graft-proxy-str").toString
    val fam = new CommitLogFamily(spark, s"$dir/log")
    val view = Proxies.view(fam, "event.*", ProxyAttributesSpec.renamingSpec("_e.*"))
    fam.append(Seq(
      StreamElement.upsert("proxied", "k1", "_e.a", "u1", 10L, Array[Byte](1)),
      StreamElement.upsert("proxied", "k1", "other", "u2", 20L, Array[Byte](2))))
    val got = graft.streaming.StreamCollector.collect(
      view.streamFromOldest(), limit = 1, timeoutMs = 30000)
    assert(got.map(_.attribute) == Seq("event.a"),
      s"stream must rename _e.a -> event.a and hide 'other': $got")
  }
}

object ProxyAttributesSpec {
  def renamingSpec(target: String): ProxySpec =
    graft.core.ProxySpec(Some(ProxySide(target, None)), Some(ProxySide(target, None)))
}
