package graft.tools

import scala.sys.process.{Process, ProcessLogger}

import graft.SparkSpec
import graft.core.StreamElement
import graft.streaming.{EmbeddedKafka, KafkaLogFamily}

/** The kafka wire binding across PROCESS boundaries: a
  * [[KafkaWireBroker]] child JVM owns the log; this Spark session and a
  * Spark-free client child JVM ([[KafkaWireSmoke]]) are its peers over
  * TCP. Pins the deployment topology the in-JVM double could not: a
  * producer in one process, a Structured Streaming consumer in another,
  * offsets and group commits living in a third — including a streaming
  * RESTART whose recovered offsets must line up with a log the restarted
  * process never held in memory.
  */
class KafkaWireSmokeSpec extends SparkSpec {

  private def up(key: String, attr: String, stamp: Long, v: String) =
    StreamElement("gw", key, attr, s"u-$key-$attr-$stamp", 0, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  test("broker in its own JVM: cross-process produce/consume, streaming " +
      "restart recovery, group commit visible to a third process") {
    // ---- broker process
    val brokerOut = new StringBuilder
    val brokerProc = Process(Seq(ChildJvm.javaBin, "-cp",
      System.getProperty("java.class.path"),
      "graft.tools.KafkaWireBroker", "0")).run(ProcessLogger(
      l => brokerOut.synchronized { brokerOut.append(l).append('\n') },
      _ => ()))
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def port(): Option[Int] = brokerOut.synchronized {
        brokerOut.toString.linesIterator
          .find(_.startsWith("KAFKAWIRE LISTENING"))
          .map(_.split(' ').last.toInt)
      }
      while (port().isEmpty) {
        assert(System.nanoTime() < deadline, s"broker never bound:\n$brokerOut")
        Thread.sleep(50)
      }
      val addr = s"127.0.0.1:${port().get}"
      val broker = s"tcp:$addr"

      def client(args: String*): String = {
        val out = new StringBuilder
        val rc = Process(Seq(ChildJvm.javaBin, "-cp",
          System.getProperty("java.class.path"),
          "graft.tools.KafkaWireSmoke") ++ args).!(ProcessLogger(
          l => out.synchronized { out.append(l).append('\n') }, _ => ()))
        assert(rc == 0, s"client ${args.mkString(" ")} failed:\n$out")
        out.synchronized { out.toString }
      }

      // ---- a Spark-free process produces; this Spark session reads the
      // records it never saw produced (they exist only on the broker)
      val o1 = client("produce", addr, "xp", "alpha", "12")
      assert(o1.contains("produced=12"), o1)
      val t = EmbeddedKafka.topic(broker, "xp")
      val fam = new KafkaLogFamily(spark, t)
      val fromOther = fam.batchUpdates().collect()
      assert(fromOther.length == 12 &&
        fromOther.forall(_.key.startsWith("alpha")))

      // ---- this session produces through DSv2 executor tasks; a THIRD
      // process consumes and acks through the broker
      import graft.SparkSpec.spark.implicits._
      fam.append(spark.createDataset(
        (1 to 8).map(i => up(s"beta$i", "a", 100 + i, s"b$i"))).repartition(4))
      val o2 = client("consume", addr, "xp", "g-x")
      assert(o2.contains("consumed=20"), s"third process reads both: $o2")
      // its ack landed on the broker: nothing replays for the group
      assert(fam.consumer("g-x").pollUncommitted().isEmpty)

      // ---- streaming restart recovery against the out-of-process log
      val cp = java.nio.file.Files
        .createTempDirectory("graft-wire-smoke-cp-").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      def run(): Unit = {
        val q = fam.streamFromOldest("g-stream").writeStream
          .option("checkpointLocation", cp)
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[StreamElement], _: Long) =>
              b.collect().foreach(e => seen.add(e.uuid))
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      run()
      assert(seen.size == 20, s"first run replays the whole remote log")
      client("produce", addr, "xp", "gamma", "5")
      run()
      assert(seen.size == 25,
        "restart resumes from checkpointed offsets against records a " +
          s"DIFFERENT process appended meanwhile: ${seen.size}")
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.toSeq.distinct.size == 25, "no record twice")
      assert(t.committed("g-stream").values.sum >= 20)
    } finally brokerProc.destroy()
  }

  test("replicated broker PAIR across processes: acks=all over real " +
      "sockets; the leader process is KILLED and every acked record " +
      "survives on the follower; a fresh broker process re-joins with " +
      "--sync-from byte-identical") {
    def startBroker(args: String*): (Process, StringBuilder) = {
      val out = new StringBuilder
      val p = Process(Seq(ChildJvm.javaBin, "-cp",
        System.getProperty("java.class.path"),
        "graft.tools.KafkaWireBroker") ++ args).run(ProcessLogger(
        l => out.synchronized { out.append(l).append('\n') }, _ => ()))
      (p, out)
    }
    def await(out: StringBuilder, what: String): String = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def find(): Option[String] = out.synchronized {
        out.toString.linesIterator.find(_.startsWith(what))
      }
      while (find().isEmpty) {
        assert(System.nanoTime() < deadline, s"no '$what' from broker:\n$out")
        Thread.sleep(50)
      }
      find().get
    }
    def portOf(out: StringBuilder): Int =
      await(out, "KAFKAWIRE LISTENING").split(' ').last.toInt
    def client(args: String*): String = {
      val out = new StringBuilder
      val rc = Process(Seq(ChildJvm.javaBin, "-cp",
        System.getProperty("java.class.path"),
        "graft.tools.KafkaWireSmoke") ++ args).!(ProcessLogger(
        l => out.synchronized { out.append(l).append('\n') }, _ => ()))
      assert(rc == 0, s"client ${args.mkString(" ")} failed:\n$out")
      out.synchronized { out.toString }
    }

    val (followerProc, followerOut) = startBroker("0")
    val rejoinRef = new java.util.concurrent.atomic.AtomicReference[Process]()
    try {
      val fPort = portOf(followerOut)
      val (leaderProc, leaderOut) = startBroker("0",
        "--follower", s"tcp:127.0.0.1:$fPort")
      val lPort = portOf(leaderOut)
      // a Spark-free process produces 40 records AGAINST THE LEADER;
      // each ack means "on both replicas" (synchronous forward)
      val o = client("produce", s"127.0.0.1:$lPort", "xr", "alpha", "40")
      assert(o.contains("produced=40"), o)
      // the leader DIES — destroy() is the process-kill analog: its
      // sockets die with it
      leaderProc.destroy()
      leaderProc.exitValue() // reap
      // this Spark session repoints to the FOLLOWER and reads every
      // acked record through the DSv2 splits
      val ft = EmbeddedKafka.topic(s"tcp:127.0.0.1:$fPort", "xr")
      val fam = new KafkaLogFamily(spark, ft)
      val survived = fam.batchUpdates().collect()
      assert(survived.length == 40 &&
        survived.forall(_.key.startsWith("alpha")),
        s"follower must serve the complete acked log: ${survived.length}")
      // a FRESH broker process re-joins the pair from the survivor
      val (rejoinProc, rejoinOut) = startBroker("0",
        "--sync-from", s"tcp:127.0.0.1:$fPort")
      rejoinRef.set(rejoinProc)
      val synced = await(rejoinOut, "KAFKAWIRE SYNCED")
      assert(synced.endsWith(" 40"), s"sync must copy all 40: $synced")
      val rPort = portOf(rejoinOut)
      val rt = EmbeddedKafka.topic(s"tcp:127.0.0.1:$rPort", "xr")
      (0 until rt.numPartitions).foreach { p =>
        assert(rt.slice(p, 0, Long.MaxValue).map(_.uuid).toSeq ==
          ft.slice(p, 0, Long.MaxValue).map(_.uuid).toSeq,
          s"re-joined replica diverges on partition $p")
      }
    } finally {
      Option(rejoinRef.get).foreach(_.destroy())
      followerProc.destroy()
    }
  }
}
