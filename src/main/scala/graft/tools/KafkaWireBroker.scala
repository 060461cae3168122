package graft.tools

import graft.streaming.KafkaWire

/** Standalone broker PROCESS for the `kafka://` wire binding: owns the
  * topic log in its JVM and serves [[graft.streaming.KafkaWire]] on a
  * TCP port. Spark sessions in OTHER processes reach it with broker id
  * `tcp:<host>:<port>` — producers, consumers, streaming restarts and
  * group commits all cross a real process boundary (KafkaWireSmokeSpec
  * drives exactly that topology).
  *
  * Run: `java -cp ... graft.tools.KafkaWireBroker [port]` (0 = ephemeral;
  * prints `KAFKAWIRE LISTENING <port>` once bound, then serves forever).
  */
object KafkaWireBroker {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(0)
    val server = new KafkaWire.Server(port).start()
    println(s"KAFKAWIRE LISTENING ${server.port}")
    Console.flush()
    Thread.currentThread.join() // serve until killed
  }
}
