package graft.ops

import org.apache.spark.sql.SparkSession

/** The shared half of the segment-lifecycle protocol every flat at-rest
  * index family implements (IVF lists in [[Ann]], [[Sq]]/[[Pq]] codes,
  * [[Hnsw]] segments, [[graft.search.Bm25]] segments, the [[Dedup]]
  * MinHash signature store):
  *
  *   - DELETE is a tombstone-sidecar append at `path/_tombstones`: no
  *     stored file is touched, every probe excludes the dead ids
  *     ([[Layout.excludeTombstoned]] or a family-specific fold), and the
  *     family's compact purges them physically. A delete is terminal for
  *     that id until then.
  *   - STREAMING APPEND is the family's append wrapped in the
  *     marker-file batch ledger at `path/batches`
  *     ([[Layout.ledgeredBatch]]): at-least-once micro-batch delivery
  *     converges to exactly-once growth.
  *
  * The trait owns the protocol's fixed surface — the sidecar paths, the
  * tombstone write, the ledger wrap — so a new family only supplies what
  * is genuinely its own: what an append writes, what a probe reads, what
  * a compact rewrites. Zero behavior change vs the previously hand-rolled
  * wrappers; each family's public names (`deleteIvf`, `deleteCodes`,
  * `deleteDocs`, …) remain as thin delegates, so no caller moved.
  *
  * [[graft.index.VectorIndex]] stays outside deliberately: its
  * merge-on-read tombstones are EPOCH-stamped (`(doc_id, tomb_epoch)`,
  * the upsert/AS-OF law) — a different sidecar schema, not an instance
  * of this one.
  */
private[graft] trait IndexLifecycle {

  /** Column name this family's tombstones are written with — must match
    * the id column its probes and compacts anti-join on.
    */
  protected def lifecycleIdCol: String

  protected final def tombstonesPath(path: String): String =
    s"$path/_tombstones"

  protected final def batchesPath(path: String): String = s"$path/batches"

  /** Tombstone-sidecar delete (the shared stance: probes exclude, the
    * family's compact purges). Empty `ids` is a no-op — no sidecar dir
    * is created.
    */
  protected final def markDeleted(
      spark: SparkSession,
      path: String,
      ids: Seq[Long],
      idCol: String): Unit = {
    import spark.implicits._
    if (ids.nonEmpty)
      ids.toDF(idCol).write.mode("append").parquet(tombstonesPath(path))
  }

  protected final def markDeleted(
      spark: SparkSession, path: String, ids: Seq[Long]): Unit =
    markDeleted(spark, path, ids, lifecycleIdCol)

  /** Run `body` (the family's append) only if `batchId` is not yet in
    * the ledger, then record it. Returns true when the batch applied.
    */
  protected final def ledgered(
      spark: SparkSession, path: String, batchId: Long)(
      body: => Unit): Boolean =
    Layout.ledgeredBatch(spark, batchesPath(path), batchId)(body)
}
