package graft.tools

import graft.streaming.KafkaWire

/** Standalone broker PROCESS for the `kafka://` wire binding: owns the
  * topic log in its JVM and serves [[graft.streaming.KafkaWire]] on a
  * TCP port. Spark sessions in OTHER processes reach it with broker id
  * `tcp:<host>:<port>` — producers, consumers, streaming restarts and
  * group commits all cross a real process boundary (KafkaWireSmokeSpec
  * drives exactly that topology).
  *
  * Run: `java -cp ... graft.tools.KafkaWireBroker [port]
  *   [--follower tcp:<host>:<port>]... [--sync-from tcp:<host>:<port>]`
  * (port 0 = ephemeral; prints `KAFKAWIRE LISTENING <port>` once bound
  * — and `KAFKAWIRE SYNCED <topics> <records>` after a re-join sync —
  * then serves forever).
  *
  * `--follower` makes this broker a replicating LEADER: every mutation
  * is forwarded synchronously to each follower before the producer is
  * acked (acks=all). `--sync-from` makes a (re)started follower clone
  * the peer's topics before taking traffic — the re-join path after a
  * follower crash.
  */
object KafkaWireBroker {
  def main(args: Array[String]): Unit = {
    var port = 0
    val followers = Seq.newBuilder[String]
    var syncFrom = Option.empty[String]
    def operand(i: Int, flag: String): String = {
      if (i + 1 >= args.length)
        sys.error(s"$flag needs an operand (tcp:<host>:<port>) — " +
          "usage: KafkaWireBroker [port] [--follower tcp:h:p]... " +
          "[--sync-from tcp:h:p]")
      args(i + 1)
    }
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--follower"  => followers += operand(i, "--follower"); i += 2
        case "--sync-from" => syncFrom = Some(operand(i, "--sync-from")); i += 2
        case p             => port = p.toInt; i += 1
      }
    }
    val server = new KafkaWire.Server(port, followers.result()).start()
    syncFrom.foreach { peer =>
      val (topics, records) = server.syncFrom(peer)
      println(s"KAFKAWIRE SYNCED $topics $records")
    }
    println(s"KAFKAWIRE LISTENING ${server.port}")
    Console.flush()
    Thread.currentThread.join() // serve until killed
  }
}
