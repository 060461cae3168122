package graft.service

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.{GraftOperator, Repository}

/** Deployable ingest server: ONE process that boots the repository from a
  * config path, starts every config-declared transformation/replication as
  * a continuous query, and opens the HTTP front door — the reference's
  * ingest-server process shape (reference: direct/ingest-server/.../
  * IngestServer.java wiring IngestService + RetrieveService +
  * ReplicationController from a config file; entry semantics of
  * IngestService.java / ReplicationController.java).
  *
  * `boot` is the embeddable form (used by tests and hosts that bring their
  * own SparkSession); `main` is the operational form (set `GRAFT_BIND` to
  * an external interface — the gateway binds loopback by default):
  *
  * {{{
  *   runMain graft.service.IngestServer /path/to/graft.conf [port] [checkpointRoot]
  * }}}
  *
  * Writes arriving over HTTP land in each attribute's primary family;
  * transformations observe the commit logs and route derived elements to
  * their target families with idempotent-by-uuid appends, so a crash
  * between target write and checkpoint commit cannot duplicate (the
  * controller contract spec-tested in TransformationControllerSpec).
  */
object IngestServer {

  /** A running server: HTTP gateway + gRPC front door + transformation
    * queries.
    */
  final case class Handle(op: GraftOperator, gateway: HttpGateway,
      grpc: GrpcServer, transformations: Seq[StreamingQuery]) {
    def port: Int = gateway.boundPort
    def grpcPort: Int = grpc.boundPort
    def stop(): Unit = {
      transformations.foreach(q =>
        try q.stop() catch { case _: Exception => () })
      gateway.stop()
      grpc.stop()
    }
  }

  /** Boot from config text: parse the repository, start the declared
    * transformations, open the HTTP gateway and the gRPC server
    * (port 0 = ephemeral; gRPC listens on `grpcPort`, by convention
    * HTTP port + 1 when a fixed port is given).
    */
  def boot(spark: SparkSession, configText: String, port: Int = 0,
      checkpointRoot: String =
        Files.createTempDirectory("graft-ingest-ckpt-").toString,
      grpcPort: Int = 0): Handle = {
    val repo = Repository.parse(configText)
    val op = new GraftOperator(spark, repo)
    val queries = op.startTransformations(checkpointRoot)
    // ONE transaction registry across both transports: a tx begun over
    // HTTP is committable over gRPC and vice versa
    val txs = new TxRegistry(op)
    val gateway = new HttpGateway(op, port, txRegistry = Some(txs)).start()
    val grpc = new GrpcServer(op,
      if (grpcPort == 0 && port != 0) port + 1 else grpcPort,
      txRegistry = Some(txs)).start()
    Handle(op, gateway, grpc, queries)
  }

  /** Boot from a config file path (the process form). */
  def bootFromPath(spark: SparkSession, configPath: String, port: Int = 0,
      checkpointRoot: String =
        Files.createTempDirectory("graft-ingest-ckpt-").toString): Handle =
    boot(spark,
      new String(Files.readAllBytes(Paths.get(configPath)), "UTF-8"),
      port, checkpointRoot)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: IngestServer <config.conf> [port] [checkpointRoot]")
    val port = if (args.length > 1) args(1).toInt else 8420
    val spark = graft.GraftSession.local()
    val handle = bootFromPath(spark, args(0), port,
      if (args.length > 2) args(2)
      else Files.createTempDirectory("graft-ingest-ckpt-").toString)
    // one machine-readable boot line, then serve until the process dies
    println(s"""{"service":"graft-ingest","port":${handle.port},""" +
      s""""grpcPort":${handle.grpcPort},""" +
      s""""transformations":${handle.transformations.size}}""")
    val forever = new CountDownLatch(1)
    sys.addShutdownHook { handle.stop(); forever.countDown() }
    forever.await()
  }
}
