package graft.tools

import graft.core.StreamElement
import graft.streaming.EmbeddedKafka

/** Lightweight (Spark-free) client PROCESS for the kafka wire smoke:
  * produces to / consumes from a [[KafkaWireBroker]] in another process,
  * so the KafkaWireSmokeSpec topology has three genuinely separate JVMs
  * (broker, this client, the Spark session) sharing one log over TCP.
  *
  * Modes:
  *  - `produce <host:port> <topic> <keyPrefix> <n>` — append n updates
  *  - `consume <host:port> <topic> <group>` — poll uncommitted records
  *    for the group, print their keys, ack them all
  */
object KafkaWireSmoke {
  def main(args: Array[String]): Unit = {
    val broker = s"tcp:${args(1)}"
    val topic = EmbeddedKafka.topic(broker, args(2))
    args(0) match {
      case "produce" =>
        val (prefix, n) = (args(3), args(4).toInt)
        (1 to n).foreach { i =>
          topic.append(StreamElement("gw", s"$prefix$i", "a",
            s"u-$prefix$i", 0, i.toLong, s"v$i".getBytes("UTF-8"),
            delete = false, deleteWildcard = false))
        }
        println(s"KWIRE produced=$n latest=${topic.latestOffsets.values.sum}")
      case "consume" =>
        val c = new EmbeddedKafka.Consumer(topic, args(3))
        val recs = c.pollUncommitted()
        c.ack(recs)
        println(s"KWIRE consumed=${recs.size} " +
          s"keys=${recs.map(_.element.key).sorted.mkString(",")}")
      case other => sys.error(s"unknown mode $other")
    }
  }
}
