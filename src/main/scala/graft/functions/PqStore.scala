package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.StoreManifest

/** Persisted IVF-PQ serving store — the compressed twin of [[IvfStore]]
  * and the true 100 TB ANN serving layout: PQ CODES (m bytes + one
  * reconstruction norm per vector, a 32x-64x compression of a float
  * corpus) persisted hive-partitioned by coarse IVF cell. A query batch
  * then pays:
  *   - manifest-side pruning to its nProbe cells' files (the
  *     [[StoreManifest]] read path shared with [[IvfStore]] — no
  *     directory listing, atomic version flips under maintenance),
  *   - an ADC scan of the pruned codes — m one-byte table lookups per
  *     scored vector, never a float-vector read.
  * The float corpus is read exactly once per vector, at ingest time.
  *
  * Maintenance parity with [[IvfStore]]: [[append]] files deltas
  * O(delta) with the FROZEN quantizers, [[appendIdempotent]] +
  * [[replicate]] make streaming replay converge instead of duplicating,
  * [[upsert]] re-encodes changed vectors, [[removeMatching]] serves
  * takedowns, [[compactCells]] defragments — a compressed serving copy
  * needs the same restart-safe convergence story as the exact one, or
  * replication to it becomes the pipeline's weak link.
  *
  * Both quantizers persist WITH the store as exact binary64 bit patterns
  * (the [[IvfStore]] discipline): the coarse centroids ARE the directory
  * layout and the codebooks ARE the meaning of every stored byte, so a
  * maintainer must use [[PqStore.open]] — a drifted handle would file
  * vectors into cells the probe logic never visits, or decode bytes
  * against the wrong centroid tables. Same exactness anchor as [[Pq]]:
  * at full probe the store answers exactly like [[Pq.searchTopK]] over
  * the same codebooks (spec-enforced + oracles q_pq_store_topk /
  * q_pq_store_stream on the exact-reconstruction corpus).
  */
final class PqStore(spark: SparkSession, val path: String,
    cb: Pq.Codebooks, coarse: Array[Array[Double]]) {

  import spark.implicits._

  private val CodebooksFile = "_codebooks"

  private def fs: org.apache.hadoop.fs.FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The shared manifest-store plumbing, bound to this store's layout. */
  private val store = StoreManifest.Handle(spark, path, "cell")

  private def manifest(op: String): StoreManifest.Manifest = store.resolve(op)

  private def storeDf(m: StoreManifest.Manifest,
      cells: Option[Seq[Int]] = None): DataFrame = store.scan(m, cells)

  /** The encode + coarse-assign projection every ingest path shares:
    * codes from the frozen codebooks, cell from the frozen coarse
    * quantizer, cell-clustered layout. ONE fused map-only pass
    * ([[Pq.encodeAssigned]]) — no vec_id self-join, so a delta that
    * slips duplicate ids past a caller produces two intact rows (like
    * [[IvfStore]]), never cross-product hybrids pairing one
    * duplicate's code with the other's cell.
    */
  private def encoded(delta: DataFrame): DataFrame =
    Pq.encodeAssigned(delta, cb, coarse)
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("vec_id"))

  /** Encode + assign + persist, and save both quantizers alongside. */
  def write(emb: DataFrame): Unit = {
    val enc = encoded(emb)
    // forced static: dynamic partitionOverwriteMode would merge stale
    // cells into a rebuild (see IvfStore.write)
    enc.write.partitionBy("cell").mode("overwrite")
      .option("partitionOverwriteMode", "static").parquet(path)
    IvfStore.saveCentroids(spark, path, coarse)
    saveCodebooks()
    store.publishInitial(store.readSchema(enc.schema,
      org.apache.spark.sql.types.IntegerType))
    ()
  }

  /** Incremental fold: encode a DELTA with the persisted (frozen)
    * quantizers and append into its touched cells — O(delta), no
    * rebuild; retraining is a deliberate [[write]].
    */
  def append(delta: DataFrame): Unit = {
    requireQuantizerMatch("append")
    val m = manifest("append")
    store.commitSwap(m, encoded(delta), Seq.empty)
    ()
  }

  /** Restart-safe delta fold — [[append]] minus rows whose vec_id the
    * store already holds (the [[IvfStore.appendIdempotent]] contract):
    * the existence check anti-joins the STORE-WIDE vec_id column
    * (column-pruned — ids are a sliver of even the compressed store's
    * bytes), so a replayed vec_id is dropped even when its re-offered
    * embedding would encode into a different cell. Idempotence of vector
    * IDENTITY, not upsert; duplicate ids within one delta refuse loudly.
    */
  def appendIdempotent(delta: DataFrame): Unit = {
    requireQuantizerMatch("appendIdempotent")
    val m = manifest("appendIdempotent")
    // pinned: validation and the committed write must see one row set
    val cached = delta.persist()
    try {
      val Array(n, d) = cached
        .agg(count(lit(1)), countDistinct(col("vec_id")))
        .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
      require(n == d,
        s"appendIdempotent: delta carries ${n - d} duplicate vec_ids — two " +
          "embeddings for one id is a data error (upsert to re-embed)")
      if (n == 0) return
      val existing = storeDf(m).select("vec_id")
      val fresh = cached.join(existing, Seq("vec_id"), "left_anti")
      store.commitSwap(m, encoded(fresh), Seq.empty)
      ()
    } finally { cached.unpersist(); () }
  }

  /** Maintain the compressed copy from a streaming embedding feed — each
    * micro-batch one [[appendIdempotent]], so checkpoint-restart replay
    * converges instead of duplicating. Caller `.start()`s the writer.
    */
  def replicate(stream: DataFrame, checkpoint: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendIdempotent(batch)
      }

  /** Re-embedding fold: re-encode the delta with the frozen quantizers
    * and replace any stored code whose vec_id it carries — the delta's
    * NEW embeddings decide both the new codes and the new cells.
    *
    * Both legs land in ONE manifest generation (the [[IvfStore.upsert]]
    * discipline): swap set = cells holding a matched id ∪ cells the
    * re-encoded delta files into, replacement = those cells' survivors +
    * the encoded delta, one commitSwap. A crash at any point leaves the
    * full old version or the full new one — never "ids removed, codes
    * not yet re-added". Validation (duplicate ids, encodability) runs
    * FIRST so a refused upsert leaves the store untouched.
    */
  def upsert(delta: DataFrame): Unit = {
    requireQuantizerMatch("upsert")
    val m = manifest("upsert")
    // the dup/row counts run over the ENCODED projection, not the raw
    // delta: that forces Pq.encode (schema resolution + the dimension
    // guard) over every row, so a delta that cannot be encoded refuses
    // HERE — before anything is staged
    // persisted: five actions touch this projection, and each would
    // otherwise re-run the FULL PQ encode (m nearest-centroid searches
    // per row) over the delta; the pin also guarantees the removal id
    // set and the filed replacement come from the same row set
    val enc = encoded(delta).persist()
    try {
      val Array(n, d) = enc
        .agg(count(lit(1)), countDistinct(col("vec_id")))
        .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
      require(n == d,
        s"upsert: delta carries ${n - d} duplicate vec_ids — two embeddings " +
          "for one id is a data error")
      if (n == 0) return
      val idSet = enc.select("vec_id")
      val oldCells = storeDf(m).join(idSet, Seq("vec_id"), "left_semi")
        .select("cell").distinct()
        .collect().map(_.get(0).toString.toInt)
      val newCells = enc.select("cell").distinct()
        .collect().map(_.get(0).toString.toInt)
      val touched = (oldCells ++ newCells).distinct.sorted.toSeq
      val survivors = storeDf(m, Some(touched))
        .join(idSet, Seq("vec_id"), "left_anti")
      store.commitSwap(m,
        survivors.unionByName(enc)
          .repartition(col("cell"))
          .sortWithinPartitions(col("cell"), col("vec_id")),
        touched)
      ()
    } finally { enc.unpersist(); () }
  }

  /** Takedown on the COMPRESSED copy: a removed vector must leave every
    * serving layout, not just the exact store. Same shape as
    * [[IvfStore.removeMatching]]: the id set stays a Dataset (semi/anti
    * joins, never through the driver), only the matched cells' code
    * files are replaced (manifest swap — atomic version flip), and
    * cells left empty disappear.
    */
  def removeMatching(ids: DataFrame): Unit = {
    requireQuantizerMatch("removeMatching")
    val m = manifest("removeMatching")
    val idSet = ids.select("vec_id")
    val touched = storeDf(m).join(idSet, Seq("vec_id"), "left_semi")
      .select("cell").distinct()
      .collect().map(_.get(0).toString.toInt).sorted.toSeq
    if (touched.isEmpty) return
    store.commitSwap(m,
      storeDf(m, Some(touched))
        .join(idSet, Seq("vec_id"), "left_anti")
        .repartition(col("cell"))
        .sortWithinPartitions(col("cell"), col("vec_id")),
      touched)
    ()
  }

  /** Defragmentation after many [[append]]s — fragmentation read off the
    * MANIFEST, only fragmented cells rewritten; contents preserved
    * exactly ([[IvfStore.compactCells]] twin).
    */
  def compactCells(maxFilesPerCell: Int = 4): Unit = {
    requireQuantizerMatch("compactCells")
    val m = manifest("compactCells")
    val fragmented = store.fragmented(m, maxFilesPerCell).map(_.toInt)
    if (fragmented.isEmpty) return
    store.commitSwap(m,
      storeDf(m, Some(fragmented))
        .repartition(col("cell"))
        .sortWithinPartitions(col("cell"), col("vec_id")),
      fragmented)
    ()
  }

  /** Reclaim files no retained manifest references (crashed-mutation
    * garbage). Run from the (single) maintainer only.
    */
  def vacuum(): Seq[String] = store.vacuum()

  /** The current version's full contents (codes + norms + cells) — see
    * [[IvfStore.contents]] for why a raw directory read is wrong.
    */
  def contents(): DataFrame = storeDf(manifest("contents"))

  /** The cell-pruned code scan a query batch performs — files selected
    * from the current manifest, no directory listing.
    */
  def probedCodes(probeCells: Set[Int]): DataFrame = {
    val m = manifest("probedCodes")
    storeDf(m, Some(probeCells.toSeq))
  }

  /** ADC cosine top-k per query vector over the probed cells only —
    * the [[Pq.searchTopKIvf]] semantics served from the persisted
    * layout (same output schema: q_id, rk, neighbor_id, cos).
    */
  def searchTopK(queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val qVecs = Similarity.toVecs(queries).collect()
    // loud dimension contract (the ingest side's Pq.encode guard,
    // mirrored): a long query would build ADC tables from a PREFIX
    // while its norm spans all dims — silently deflated cosines; a
    // short one would AIOOBE deep in adcTables with no mention of why
    qVecs.foreach(q => require(q.v.length == cb.m * cb.dsub,
      s"searchTopK: a ${q.v.length}-d query cannot probe a " +
        s"${cb.m}x${cb.dsub}-d store — embedding dimension must match " +
        "the quantizer's"))
    val probes = Ivf.probeSets(qVecs, coarse, nProbe)
    val tables = Pq.adcTables(qVecs, cb)
    val allCells = probes.values.flatten.toSet
    val tb = spark.sparkContext.broadcast(tables)
    val pb = spark.sparkContext.broadcast(probes)
    val scored = probedCodes(allCells)
      .select(col("vec_id"), col("code"), col("recon_norm"),
        col("cell").cast("int"))
      .as[(Long, Array[Byte], Double, Int)]
      .mapPartitions { it =>
        val ts = tb.value
        val pr = pb.value
        it.flatMap { case (id, code, rnorm, cell) =>
          ts.iterator
            .filter { case (qid, _, _) => qid != id && pr(qid).contains(cell) }
            .map { case (qid, qnorm, t) =>
              var j = 0; var s = 0.0
              while (j < code.length) { s += t(j)(code(j) & 0xff); j += 1 }
              (qid, id, Similarity.cosine(s, qnorm, rnorm))
            }
        }
      }.toDF("q_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("neighbor_id"), col("cos"))
  }

  /** Codebooks as text: header `m dsub`, then one line per subspace,
    * centroids ';'-separated, dimensions as exact binary64 bits in hex
    * (the [[IvfStore]] bit-exactness rationale, doubled: the codebooks
    * are the meaning of every stored byte).
    */
  private def saveCodebooks(): Unit = {
    val body = (s"${cb.m} ${cb.dsub}" +:
      cb.centroids.toSeq.map(_.map(_.map(d =>
          java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(d)))
        .mkString(",")).mkString(";"))).mkString("\n")
    val p = new Path(s"$path/$CodebooksFile")
    val out = fs.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  private def requireQuantizerMatch(op: String): Unit = {
    val storedCoarse = IvfStore.loadCentroids(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$op: no persisted coarse quantizer at $path — write() first"))
    val storedCb = PqStore.loadCodebooks(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$op: no persisted codebooks at $path — write() first"))
    require(storedCoarse.length == coarse.length &&
        storedCoarse.zip(coarse).forall { case (a, b) =>
          java.util.Arrays.equals(a, b) } &&
        storedCb.m == cb.m && storedCb.dsub == cb.dsub &&
        storedCb.centroids.length == cb.centroids.length &&
        storedCb.centroids.zip(cb.centroids).forall { case (sj, j) =>
          sj.length == j.length &&
            sj.zip(j).forall { case (a, b) => java.util.Arrays.equals(a, b) } },
      s"$op: this handle's quantizers differ from the store's persisted " +
        "set — use PqStore.open for maintenance; rebuild with write() to " +
        "retrain.")
  }
}

object PqStore {

  /** Open an existing store from its persisted quantizers — the only
    * safe maintenance/serving handle across sessions.
    */
  def open(spark: SparkSession, path: String): PqStore = {
    val coarse = IvfStore.loadCentroids(spark, path).getOrElse(
      throw new IllegalStateException(
        s"no persisted coarse quantizer at $path — not a PqStore"))
    val cb = loadCodebooks(spark, path).getOrElse(
      throw new IllegalStateException(
        s"no persisted codebooks at $path — not a PqStore"))
    new PqStore(spark, path, cb, coarse)
  }

  private[functions] def loadCodebooks(spark: SparkSession,
      path: String): Option[Pq.Codebooks] = {
    val p = new Path(s"$path/_codebooks")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      // same loud-refusal contract as IvfStore.loadCentroids: the
      // codebooks are the meaning of every stored byte, so corrupt
      // metadata must name itself instead of decoding garbage
      val cb =
        try {
          val lines = text.split("\n")
          val Array(m, dsub) = lines.head.split(" ").map(_.toInt)
          val cents = lines.tail.map(_.split(";").map(_.split(",").map(h =>
            java.lang.Double.longBitsToDouble(
              java.lang.Long.parseUnsignedLong(h, 16)))))
          require(m > 0 && dsub > 0 && cents.length == m &&
            cents.forall(_.forall(_.length == dsub)))
          Pq.Codebooks(m, dsub, cents)
        } catch { case e: Exception =>
          throw new IllegalStateException(
            s"corrupt persisted codebooks at $p — the file is the meaning " +
              "of every stored code byte; restore it or rebuild with " +
              "write()", e)
        }
      Some(cb)
    }
  }
}
