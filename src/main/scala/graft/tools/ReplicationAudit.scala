package graft.tools

import graft.core.StreamElement
import graft.streaming.{EmbeddedKafka, KafkaWire}

/** One-off audit: what does acks=all replication COST on the wire
  * produce path? Appends the same volume through a standalone broker,
  * a leader+1-follower pair, and a leader+2-follower fan-out — first
  * as sequential producer batches (the DSv2 task-commit shape), then
  * as 8 concurrent producers (the shape the per-topic replication
  * sequencer serializes). Prints one `REPL_AUDIT` line per
  * (followers, mode); the receipt BENCH_NOTES cites.
  *
  * Run: `sbt "runMain graft.tools.ReplicationAudit [records]"`.
  */
object ReplicationAudit {
  private def elem(i: Int): StreamElement =
    StreamElement("ra", s"k${i % 997}", "a", s"u-$i", 0, i.toLong,
      s"value-payload-$i".getBytes("UTF-8"), delete = false,
      deleteWildcard = false)

  def main(args: Array[String]): Unit = {
    val total = args.headOption.map(_.toInt).getOrElse(20000)
    val batch = 500
    Seq(0, 1, 2).foreach { nf =>
      val followers = (0 until nf).map(_ => new KafkaWire.Server(0).start())
      val leader = new KafkaWire.Server(0,
        followers = followers.map(f => s"tcp:127.0.0.1:${f.port}")).start()
      val broker = s"tcp:127.0.0.1:${leader.port}"
      try {
        Seq("batch", "concurrent8").foreach { mode =>
          val name = s"audit-$nf-$mode"
          EmbeddedKafka.topic(broker, name, 8)
          def produce(threads: Int): Unit = {
            val per = total / threads
            val ts = (0 until threads).map { tid =>
              new Thread(() => {
                val (h, p) = KafkaWire.hostPort(broker)
                val c = new KafkaWire.Client(h, p)
                try (0 until per by batch).foreach { off =>
                  c.appendBatch(name, (off until math.min(off + batch, per))
                    .iterator.map(i => elem(tid * per + i)))
                } finally c.close()
              })
            }
            ts.foreach(_.start()); ts.foreach(_.join())
          }
          produce(if (mode == "batch") 1 else 8)
          // timed pass on a fresh topic (the warm-up JIT-compiled both ends)
          val name2 = s"$name-timed"
          EmbeddedKafka.topic(broker, name2, 8)
          val t0 = System.nanoTime()
          val threads = if (mode == "batch") 1 else 8
          val ts2 = (0 until threads).map { tid =>
            new Thread(() => {
              val per = total / threads
              val (h, p) = KafkaWire.hostPort(broker)
              val c = new KafkaWire.Client(h, p)
              try (0 until per by batch).foreach { off =>
                c.appendBatch(name2, (off until math.min(off + batch, per))
                  .iterator.map(i => elem(tid * per + i)))
              } finally c.close()
            })
          }
          ts2.foreach(_.start()); ts2.foreach(_.join())
          val ms = (System.nanoTime() - t0) / 1e6
          val landed = EmbeddedKafka.topic(broker, name2, 8)
            .latestOffsets.values.sum
          require(landed == total / threads * threads,
            s"landed $landed of $total")
          println(f"REPL_AUDIT followers=$nf mode=$mode records=$landed " +
            f"ms=$ms%.0f rate=${landed / (ms / 1000)}%.0f/s")
        }
      } finally {
        leader.close(); followers.foreach(_.close())
      }
    }
  }
}
