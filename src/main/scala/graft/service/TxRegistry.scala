package graft.service

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import graft.core.{Access, GraftOperator, TransactionCoordinator, TransactionMode}

/** The server-side transaction registry shared by every wire transport
  * (HTTP gateway and gRPC): open-transaction handles with TTL expiry,
  * per-(family, mode) coordinator reuse, and the family-routing rule.
  * ONE registry per server process — a transaction begun over HTTP is
  * visible (and committable) over gRPC and vice versa; two transports
  * holding separate registries was exactly the drift that let their
  * validation rules diverge.
  */
final class TxRegistry(op: GraftOperator,
    txTtlMs: Long = sys.env.getOrElse("GRAFT_TX_TTL_MS", "600000").toLong) {

  /** An open transaction + the family it was begun on. All reads and
    * writes of the transaction MUST route to the same family — a
    * cross-family operation would silently read the wrong storage while
    * still widening the conflict scope, so callers check [[family]]
    * (via [[requireSameFamily]]) before every operation.
    */
  final class Handle private[TxRegistry] (
      val t: TransactionCoordinator#Transaction,
      val family: String,
      private[TxRegistry] val lastUsed: AtomicLong) {
    private[TxRegistry] def touch(): Unit =
      lastUsed.set(System.currentTimeMillis())
  }

  private val openTxs = new ConcurrentHashMap[String, Handle]()
  private val coordinators =
    new ConcurrentHashMap[(String, TransactionMode), TransactionCoordinator]()

  private def sweepExpired(): Unit = {
    val cutoff = System.currentTimeMillis() - txTtlMs
    openTxs.entrySet().removeIf(e => e.getValue.lastUsed.get() < cutoff)
  }

  /** The batch-updates family serving `entity.attribute` — the family a
    * transaction touching that attribute must be begun on.
    */
  def familyNameFor(entity: String, attribute: String): String =
    op.repo.familyFor(entity, attribute, Access.BatchUpdates)
      .getOrElse(throw new IllegalArgumentException(
        s"no batch-updates family for $entity.$attribute"))
      .name

  /** Begin a transaction on `famName`. A caller-supplied id is honored
    * only when it is NOT already open — an open id never silently
    * replaces another client's transaction (its buffered writes would
    * vanish without an error).
    */
  def begin(famName: String, mode: TransactionMode = TransactionMode.Attribute,
      requestedId: Option[String] = None): String = {
    sweepExpired()
    val coord = coordinators.computeIfAbsent((famName, mode),
      _ => new TransactionCoordinator(op.family(famName), mode))
    val id = requestedId.filter(_.nonEmpty)
      .getOrElse(java.util.UUID.randomUUID().toString)
    val prev = openTxs.putIfAbsent(id, new Handle(coord.begin(), famName,
      new AtomicLong(System.currentTimeMillis())))
    if (prev != null)
      throw new IllegalArgumentException(
        s"transaction id '$id' is already open")
    id
  }

  /** Look up an open transaction (touching its TTL clock); abandoned
    * transactions expire on every access, not just on begin.
    */
  def open(id: String): Handle = {
    sweepExpired()
    val h = openTxs.get(id)
    if (h == null)
      throw new IllegalArgumentException("unknown, expired or closed tx")
    h.touch()
    h
  }

  /** Atomically claim-and-close for commit/rollback: concurrent commits
    * of the same id cannot both reach `commit()` (the second fails
    * loudly, never a double append).
    */
  def take(id: String): Handle = {
    sweepExpired()
    val h = openTxs.remove(id)
    if (h == null)
      throw new IllegalArgumentException("unknown, expired or closed tx")
    h
  }

  /** The cross-family guard (see [[Handle]]): throws when
    * `entity.attribute` routes to a different family than the
    * transaction was begun on.
    */
  def requireSameFamily(h: Handle, entity: String, attribute: String): Unit = {
    val fam = familyNameFor(entity, attribute)
    require(fam == h.family,
      s"$entity.$attribute routes to family '$fam' but the transaction " +
        s"was begun on '${h.family}' — open one transaction per family")
  }
}
