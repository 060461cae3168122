package graft.randomaccess

import graft.SparkSpec
import graft.core.{Metrics, StreamElement}
import graft.streaming.CommitLogFamily

/** Driver-result-size guard laws: an UNPAGED random-access scan over a
  * key with more live suffixes than the session cap must truncate LOUDLY
  * (metric tick + exactly-cap rows + a visible shell marker), never ship
  * the overflow to the driver, and never silently page. The reference
  * bounds the same surface with storage-side offset/limit paging
  * (reference RandomAccessReader.java:260); our cap is the backstop for
  * the caller who didn't page.
  */
class ScanCapSpec extends SparkSpec {

  private def up(key: String, attr: String, stamp: Long, v: String) =
    StreamElement("e", key, attr, s"u-$key-$attr-$stamp", 0, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("scancap").toString

  private def withCap[A](cap: Int)(body: => A): A = {
    val key = RandomAccessReader.MaxScanRowsKey
    val before = spark.conf.getOption(key)
    spark.conf.set(key, cap.toString)
    try body
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("scanWildcardAll truncates at the session cap with a metric tick; " +
      "the overflow never reaches the driver") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append((0 until 40).map(i => up("hot", f"device.$i%03d", i.toLong, s"v$i")))
    val ra = new RandomAccessReader(fam)
    // uncapped: all 40
    assert(ra.scanWildcardAll("hot").size == 40)
    withCap(25) {
      val before = Metrics.counter("graft.randomaccess.truncated")
      val rows = ra.scanWildcardAll("hot")
      assert(rows.size == 25, "must return exactly cap rows")
      assert(rows.map(_.attribute) ==
        (0 until 25).map(i => f"device.$i%03d"), "the FIRST cap rows in order")
      assert(Metrics.counter("graft.randomaccess.truncated") == before + 1,
        "truncation must tick the metric")
      // a result under the cap stays silent
      val b2 = Metrics.counter("graft.randomaccess.truncated")
      assert(new RandomAccessReader(fam).scanWildcardAll("missing").isEmpty)
      assert(Metrics.counter("graft.randomaccess.truncated") == b2)
    }
  }

  test("scanWildcard: an explicit page rides the plan and is never capped; " +
      "an unpaged scan is") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append((0 until 40).map(i => up("hot", f"device.$i%03d", i.toLong, s"v$i")))
    val ra = new RandomAccessReader(fam)
    withCap(10) {
      // caller paged past the cap: paging wins (the reference contract —
      // offset/limit callers manage their own result size)
      val page = ra.scanWildcard("hot", "device.", offset = 5, limit = 20)
      assert(page.map(_.attribute) ==
        (5 until 25).map(i => f"device.$i%03d"))
      // unpaged: capped + metric
      val before = Metrics.counter("graft.randomaccess.truncated")
      assert(ra.scanWildcard("hot", "device.").size == 10)
      assert(Metrics.counter("graft.randomaccess.truncated") == before + 1)
    }
  }

  test("the shell's list prints a visible TRUNCATED marker when the scan " +
      "hit the cap") {
    val repo = graft.core.Repository.parse(
      """entities { e { attributes {
        |  "device.*" { scheme: string }
        |} } }
        |attributeFamilies {
        |  e-primary {
        |    entity: e
        |    attributes: [ "*" ]
        |    storage: "inmem://scancap"
        |    type: primary
        |    access: [ commit-log, batch-updates, random-access ]
        |  }
        |}""".stripMargin)
    val op = new graft.core.GraftOperator(spark, repo)
    (0 until 30).foreach(i =>
      op.write(up("hot", f"device.$i%03d", i.toLong, s"v$i")))
    def runShell(cmd: String): String = {
      val in = new java.io.ByteArrayInputStream(
        (cmd + "\nexit\n").getBytes("UTF-8"))
      val bos = new java.io.ByteArrayOutputStream()
      new graft.tools.GraftShell(op, in,
        new java.io.PrintStream(bos, true, "UTF-8")).run()
      new String(bos.toByteArray, "UTF-8")
    }
    withCap(12) {
      val out = runShell("list e hot")
      assert(out.contains("TRUNCATED"), out.takeRight(400))
      assert(out.contains(RandomAccessReader.MaxScanRowsKey))
    }
    val full = runShell("list e hot")
    assert(!full.contains("TRUNCATED"))
    assert(full.linesIterator.count(_.contains("device.")) == 30)
  }
}
