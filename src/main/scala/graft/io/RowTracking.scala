package graft.io

/** Row tracking (Delta's `rowTracking` feature): stable per-row ids
  * AND per-row commit versions.
  *
  * `_graft_row_version` (Delta's `row_commit_version`) answers "when
  * was this row last modified": appends and merge inserts stamp the
  * writing commit's version (a per-file default from the commit log —
  * [[graft.log.AddFile.addedVersion]]), COW and DV UPDATEs refresh it
  * on exactly their matched rows, and maintenance (OPTIMIZE, cluster,
  * Z-order, REORG), DV deletes, and RESTORE never touch it — rewrites
  * materialize carried rows' versions just like their ids, with NULL
  * for updated rows so they fall through to the new file's default.
  *
  * Opt-in via the carried property `graft.rowTracking = true`. Every
  * commit assigns each added file a `baseRowId` from a carried
  * high-water mark ([[graft.log.CommitLog.commit]]); row i of a file
  * defaults to `baseRowId + i`. Any rewrite that carries existing rows
  * forward — maintenance (OPTIMIZE, cluster/Z-order, REORG PURGE) and
  * copy-on-write DML/merge alike — MATERIALIZES the ids it carries into
  * a physical `__graft_row_id` column, which wins over the default at
  * read time. So compaction never changes a row's id, a COW UPDATE
  * keeps the id on both the updated row and its carried-over neighbors
  * (Delta's row-id preservation semantics), and only genuinely new
  * rows (appends, merge inserts) draw fresh ids — which is what lets
  * an incremental consumer (or a downstream dedup keyed on provenance)
  * survive both routine maintenance and point DML on a 100 TB table.
  * Read via [[GraftTable.toDfWithRowIds]] (`_graft_row_id`).
  *
  * Scale note: the read plan never ships a global file→baseRowId map.
  * Each file's base rides as a per-file constant "partition" column
  * ([[BaseCol]]) supplied by [[graft.sources.GraftFileIndex]] straight
  * from the commit log — a task only ever sees the bases of its own
  * splits, exactly like hive partition values, so a 10⁶-file table
  * costs a row-id read nothing extra.
  *
  * Multi-match caveat: the merge executors' documented
  * emit-one-row-per-match contract means a target row matched by N
  * source rows yields N output rows — each carrying the SAME preserved
  * id. If ids must stay unique under merges, deduplicate the source on
  * the merge key first (or set `failOnMultipleMatches`) — the same
  * advice the merge contract itself gives.
  *
  * Late-enable transition (documented): rows written BEFORE the
  * property was enabled carry no base and read `_graft_row_id` as
  * NULL — until the first rewrite that touches their file (OPTIMIZE or
  * COW DML), at which point the rewritten file's fresh baseRowId
  * default takes over and those rows transition NULL→id exactly once
  * (unique and stable afterwards). Id-keyed consumers should either
  * enable the property at table creation or run one OPTIMIZE right
  * after enabling it to force the backfill deterministically.
  */
object RowTracking {
  /** Public projection name (the analog of Delta's `_metadata.row_id`). */
  val Col = "_graft_row_id"

  /** Physical column name materialized into rewritten files. */
  val PhysicalCol = "__graft_row_id"

  /** Per-file constant column carrying the file's `baseRowId` from the
    * commit log into the scan (a synthetic partition column of
    * [[graft.sources.GraftFileIndex]] — never stored in the files).
    */
  val BaseCol = "__graft_base_row_id"

  /** Public row-version projection (Delta's `row_commit_version`): the
    * commit that last MODIFIED the row — appends/inserts stamp it, COW
    * and DV updates refresh it, compaction/clustering/REORG/RESTORE
    * leave it alone. NULL for rows from pre-feature files/checkpoints.
    */
  val VersionCol = "_graft_row_version"

  /** Physical row-version column materialized into rewritten files for
    * CARRIED rows (updated rows materialize NULL, so they fall through
    * to the new file's commit-version default).
    */
  val PhysicalVersionCol = "__graft_row_version"

  /** Per-file constant carrying the file's `addedVersion` from the
    * commit log (second synthetic partition column of the scan).
    */
  val BaseVersionCol = "__graft_base_row_version"

  /** Column names reserved by the feature — user data under any of them
    * would be mistaken for id plumbing at read time.
    */
  val ReservedCols: Seq[String] =
    Seq(Col, PhysicalCol, BaseCol,
      VersionCol, PhysicalVersionCol, BaseVersionCol)

  def enabled(props: Map[String, String]): Boolean =
    props.get(graft.log.CommitLog.RowTrackingKey).exists(_.trim.toBoolean)
}
