package graft.examples

import java.io.{ByteArrayInputStream, PrintStream}

import graft.GraftSession
import graft.core.{GraftOperator, Repository, StreamElement, TransactionCoordinator, TransactionMode, ValueSerializer}
import graft.service.HttpGateway
import graft.tools.GraftShell

/** Round-2 feature tour: config-driven storage bindings (kafka://,
  * cassandra://), transactions, the proto value scheme, the operator
  * console and the HTTP gateway — the surfaces a user of the reference
  * platform would reach for, end to end in one main.
  * Run: `sbt "runMain graft.examples.Tour"`.
  */
object Tour {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")

    // 1. repository with three storage bindings and a proto-typed attribute
    val repo = Repository.parse(
      """entities {
        |  gateway {
        |    attributes {
        |      "status"   { scheme: string }
        |      "profile"  { scheme: "proto:{1:id=int64;2:name=string;3:tags=repeated string}" }
        |      "device.*" { scheme: bytes }
        |    }
        |  }
        |}
        |attributeFamilies {
        |  gw-commit {
        |    entity: gateway
        |    attributes: [ "*" ]
        |    storage: "kafka://local-broker/gateway-commit"
        |    type: primary
        |    access: [ commit-log, batch-updates, batch-snapshot, random-access ]
        |  }
        |}""".stripMargin)
    val op = new GraftOperator(spark, repo)

    // 2. proto-typed write: the scheme's wire codec produces the bytes
    val profileSer = ValueSerializer.of(
      repo.entity("gateway").attribute("profile").get.scheme)
      .asInstanceOf[ValueSerializer[Map[String, Any]]]
    val profile = Map("id" -> 42L, "name" -> "gw-42", "tags" -> Seq("edge", "eu"))
    op.write(StreamElement.upsert("gateway", "g42", "profile", "uuid-1", 1000L,
      profileSer.serialize(profile)))
    val readBack = op.getRandomAccess("gateway", "profile")
      .get("g42", "profile")
      .flatMap(e => profileSer.deserialize(e.value))
    println(s"proto round trip: $readBack")

    // 3. transactions with KEY isolation over the kafka-backed family
    val coord = new TransactionCoordinator(
      op.family("gw-commit"), TransactionMode.Key)
    val tx = coord.begin()
    tx.get("g42", "status")
    tx.update(StreamElement.upsert("gateway", "g42", "status", "uuid-2", 2000L,
      "online".getBytes("UTF-8")))
    println(s"transaction committed at seq ${tx.commit()}")

    // 4. the operator console over the same repository
    val script =
      """get gateway g42 status
        |put gateway g42 device.eth0 3000 connected
        |list gateway g42 device.
        |snapshot gateway
        |exit
        |""".stripMargin
    println("-- console session --")
    new GraftShell(op, new ByteArrayInputStream(script.getBytes("UTF-8")),
      new PrintStream(System.out, true, "UTF-8")).run()

    // 5. serve it over the wire and query with a real HTTP client
    val gw = new HttpGateway(op).start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(
          s"http://127.0.0.1:${gw.boundPort}/get"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          """{"entity":"gateway","key":"g42","attribute":"status"}"""))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      println(s"http /get -> $resp")
    } finally gw.stop()

    // ---- round-3 additions ----

    // 6. scripted console expressions: predicates compile to Catalyst
    // columns, so the count runs as a distributed job
    println("-- scripted eval --")
    new GraftShell(op, new ByteArrayInputStream(
      "eval gateway.filter(attribute == \"status\").count()\nexit\n".getBytes("UTF-8")),
      new PrintStream(System.out, true, "UTF-8")).run()

    // 7. throttled streaming over the kafka family: the DSv2 source plans
    // capped micro-batches and AvailableNow drains the current snapshot
    val kafkaFam = op.family("gw-commit")
      .asInstanceOf[graft.streaming.KafkaLogFamily]
    val drained = kafkaFam.streamFromOldestThrottled(maxRecordsPerTrigger = 1)
      .writeStream.format("memory").queryName("tour_drain")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    drained.awaitTermination(60000)
    println(s"throttled AvailableNow drained ${spark.table("tour_drain").count()} records")

    // 8. the dedup pipeline with its quarantine side output
    import spark.implicits._
    val docs = ((1 to 30).map(i => (i.toLong, "common boilerplate header text here")) ++
      Seq((100L, "a genuinely unique document body"),
        (101L, "a genuinely unique document body indeed")))
      .toDF("doc_id", "text")
    val dedup = graft.functions.DedupPipeline.nearDuplicates(docs, maxBucket = 8)
    println(s"near-dup pairs: ${dedup.pairs.count()}, " +
      s"quarantined buckets: ${dedup.droppedBuckets.count()}")

    // ---- round-7 additions ----

    // 9. free-form console closures: real Scala compiled at the prompt,
    // executed as a distributed Catalyst plan
    println("-- scala() closure --")
    val shell2 = new GraftShell(op,
      new java.io.ByteArrayInputStream(
        """eval gateway.filter(scala('key.rlike("^g4")')).count()
          |eval gateway.transform(scala('df => df.groupBy("attribute").count()')).take(3)
          |""".stripMargin.getBytes("UTF-8")),
      System.out)
    shell2.run()

    // 10. exact-substring overlap via winnowing fingerprints: doc 100
    // and 101 share a long verbatim span the token-set sketches dilute
    val spanPairs = graft.functions.Winnow.substringPairs(
      graft.functions.Winnow.fingerprints(docs, "doc_id", "text", k = 12, w = 4),
      "doc_id", minShared = 1, maxBucket = 10)
    println(s"verbatim-span pairs: ${spanPairs.count()}")

    // 11. BPE tokenizer training + application: learn merges on the
    // corpus, tokenize with the trained vocabulary
    val trained = graft.functions.BpeTrain.train(spark,
      graft.functions.BpeTrain.wordTable(docs, "text"), rounds = 4)
    println("bpe merges: " + trained.merges
      .map(m => s"${m.l_sym}+${m.r_sym}->${m.merged}").mkString(", "))
    val toks = graft.functions.BpeTrain.tokenize(docs, "doc_id", "text", trained)
    println(s"bpe-tokenized docs: ${toks.count()}")
    trained.unpersist()

    // 12. ranking + selection layer: BM25 keyword search, bigram-LM
    // quality scoring with tertile buckets, token-budgeted selection
    import org.apache.spark.sql.functions.col
    val scored = graft.functions.NGramLm.score(docs, "doc_id", "text")
    println(s"bm25 hit: ${graft.functions.Bm25
      .topK(docs, "doc_id", "text", Seq("unique"), k = 1)
      .head.getLong(0)}, lm-scored docs: ${scored.count()}")
    val budget = graft.functions.BudgetSelect.select(
      docs.join(scored, "doc_id")
        .select(col("doc_id"), col("avg_logp").as("score"),
          col("n_bigrams").as("n_tokens")),
      "doc_id", "score", "n_tokens", pctBudget = 50)
    println(s"token-budget keeps ${budget.count()} docs at 50% budget")

    // 13. embedding PCA: distributed gram pass, driver-side Jacobi,
    // broadcast projection
    val emb = (1 to 40).map(i => (i.toLong,
      Array.tabulate(4)(j => math.sin(i * (j + 1)).toFloat)))
      .toDF("vec_id", "embedding")
    val basis = graft.functions.Pca.fit(emb, "embedding", 2)
    println(s"pca top-2 eigenvalues: ${basis.values.map(v =>
      f"$v%.4f").mkString(", ")}; projected rows: ${graft.functions.Pca
      .project(emb, "vec_id", "embedding", basis).count()}")

    // 14. metrics picked up along the way
    println("metrics: " + graft.core.Metrics.snapshot.toSeq.sorted
      .map { case (k, v) => s"$k=$v" }.mkString(", "))

    spark.stop()
  }
}
