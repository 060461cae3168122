package graft.service

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.core.{GraftOperator, Repository}

/** The shared wire-transaction registry: id lifecycle, duplicate-id
  * protection, exactly-once claim under concurrency, TTL expiry, and
  * the family-routing guard.
  */
class TxRegistrySpec extends SparkSpec {

  private def newOp(): GraftOperator = {
    val repo = Repository.parse(
      """entities { user { attributes {
        |  "status" { scheme: string }
        |  "audit" { scheme: string }
        |} } }
        |attributeFamilies {
        |  user-primary {
        |    entity: user
        |    attributes: [ "status" ]
        |    storage: "inmem://txreg-a"
        |    type: primary
        |    access: [ commit-log, batch-updates, batch-snapshot, random-access ]
        |  }
        |  user-audit {
        |    entity: user
        |    attributes: [ "audit" ]
        |    storage: "inmem://txreg-b"
        |    type: primary
        |    access: [ commit-log, batch-updates, batch-snapshot, random-access ]
        |  }
        |}""".stripMargin)
    new GraftOperator(spark, repo)
  }

  test("ids are unique; an OPEN duplicate rejects; a closed id is reusable") {
    val txs = new TxRegistry(newOp())
    val fam = txs.familyNameFor("user", "status")
    val a = txs.begin(fam)
    val b = txs.begin(fam)
    assert(a != b)
    // hijacking an open tx would silently discard its buffered writes
    val e = intercept[IllegalArgumentException](
      txs.begin(fam, requestedId = Some(a)))
    assert(e.getMessage.contains("already open"))
    txs.take(a) // closed -> the id may be opened fresh
    assert(txs.begin(fam, requestedId = Some(a)) == a)
  }

  test("take() claims exactly once under concurrent commit attempts") {
    val txs = new TxRegistry(newOp())
    val id = txs.begin(txs.familyNameFor("user", "status"))
    val winners = new AtomicInteger(0)
    val losers = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(8)
    val pool = Executors.newFixedThreadPool(8)
    (1 to 8).foreach { _ =>
      pool.execute { () =>
        start.await()
        try { txs.take(id); winners.incrementAndGet() }
        catch { case _: IllegalArgumentException => losers.incrementAndGet() }
        finally done.countDown()
      }
    }
    start.countDown()
    assert(done.await(30, TimeUnit.SECONDS))
    pool.shutdownNow()
    assert(winners.get() == 1 && losers.get() == 7)
  }

  test("abandoned transactions expire on any access, not just begin") {
    val txs = new TxRegistry(newOp(), txTtlMs = 1)
    val id = txs.begin(txs.familyNameFor("user", "status"))
    Thread.sleep(10)
    // the sweep runs inside open(): the stale handle is gone
    val e = intercept[IllegalArgumentException](txs.open(id))
    assert(e.getMessage.contains("unknown, expired or closed"))
  }

  test("family guard rejects cross-family operations") {
    val txs = new TxRegistry(newOp())
    val h = txs.open(txs.begin(txs.familyNameFor("user", "status")))
    txs.requireSameFamily(h, "user", "status") // same family: fine
    val e = intercept[IllegalArgumentException](
      txs.requireSameFamily(h, "user", "audit"))
    assert(e.getMessage.contains("open one transaction per family"))
    // and an unrouteable attribute names the problem
    val e2 = intercept[IllegalArgumentException](
      txs.familyNameFor("user", "nope"))
    assert(e2.getMessage.contains("no batch-updates family"))
  }
}
