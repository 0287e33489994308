package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.log.AddFile

/** Row tracking (Delta's `rowTracking` feature): stable per-row ids.
  *
  * Opt-in via the carried property `graft.rowTracking = true`. Every
  * commit assigns each added file a `baseRowId` from a carried
  * high-water mark ([[graft.log.CommitLog.commit]]); row i of a file
  * defaults to `baseRowId + i`. Maintenance rewrites (OPTIMIZE,
  * cluster/Z-order, REORG PURGE) MATERIALIZE the ids they carry into a
  * physical `__graft_row_id` column, which wins over the default at
  * read time — so compaction never changes a row's id, which is what
  * lets an incremental consumer (or a downstream dedup keyed on
  * provenance) survive routine maintenance on a 100 TB table. Read via
  * [[GraftTable.toDfWithRowIds]] (`_graft_row_id`).
  *
  * Scope note (documented contract, narrower than Delta's): ids are
  * stable across MAINTENANCE and across DV-mode DML (merge-on-read
  * never rewrites surviving rows). Copy-on-write DML rewrites assign
  * fresh ids to the rows they carry over — pair `graft.rowTracking`
  * with `graft.dv` for id stability under point deletes/updates.
  */
object RowTracking {
  /** Public projection name (the analog of Delta's `_metadata.row_id`). */
  val Col = "_graft_row_id"

  /** Physical column name materialized into rewritten files. */
  val PhysicalCol = "__graft_row_id"

  def enabled(props: Map[String, String]): Boolean =
    props.get(graft.log.CommitLog.RowTrackingKey).exists(_.trim.toBoolean)

  def indexFor(files: Seq[AddFile]): RowIdIndex =
    new RowIdIndex(files.flatMap(f => f.baseRowId.map(f.path -> _)).toMap)
}

/** Relative-path → baseRowId lookup shared with executors as a plan
  * reference object (same suffix-match + per-thread one-entry cache
  * pattern as [[DvIndex]] — scans hand back absolute paths and batch
  * rows arrive file-clustered).
  */
final class RowIdIndex(baseByRelPath: Map[String, Long]) extends Serializable {

  @transient private lazy val cache =
    new ThreadLocal[(UTF8String, Long)]()

  private def lookup(absPath: String): Long =
    baseByRelPath.collectFirst {
      case (rel, base) if absPath.endsWith("/" + rel) || absPath == rel => base
    }.getOrElse(-1L)

  /** Base row id of the file at `absPath`; -1 = the file carries none
    * (pre-feature generation) — the caller surfaces NULL.
    */
  def baseOf(absPath: UTF8String): Long = {
    var c = cache.get()
    if (c == null || !c._1.equals(absPath)) {
      c = (absPath.clone(), lookup(absPath.toString))
      cache.set(c)
    }
    c._2
  }
}

/** Codegen'd per-row default id: `baseRowId(file) + row_index`, NULL
  * when the file carries no base (pre-feature files). Used under a
  * Coalesce with the materialized `__graft_row_id` column, which wins
  * for rewritten files.
  */
case class FileBaseRowId(index: RowIdIndex, filePath: Expression)
    extends UnaryExpression {

  override def child: Expression = filePath
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val p = filePath.eval(input)
    if (p == null) null
    else {
      val base = index.baseOf(p.asInstanceOf[UTF8String])
      if (base < 0) null else java.lang.Long.valueOf(base)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("rowIdIndex", index, classOf[RowIdIndex].getName)
    val fp = filePath.genCode(ctx)
    ev.copy(code = code"""
      ${fp.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${fp.isNull}) {
        ${ev.value} = $idx.baseOf(${fp.value});
        ${ev.isNull} = ${ev.value} < 0;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(filePath = newChild)
}
