package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.log.CommitLog

/** Shared ALTER TABLE core — one metadata-only commit applying column
  * adds and/or table-property changes, CAS-guarded against concurrent
  * writers. Used by both the DSv2 catalog (`ALTER TABLE cat.ns.tbl ...`)
  * and the SQL path route (`ALTER TABLE graft.`/path`` ...`).
  *
  * Columns append at the end, nullable — the same shape the
  * schema-evolution write mode produces, so files written before the
  * ALTER read the new column as null with no rewrite (the property that
  * keeps ALTER TABLE metadata-only on a 100 TB table).
  *
  * Properties use the commit log's carry-forward contract: only
  * reserved `graft.*` keys persist across commits (e.g. `graft.cdf`,
  * `graft.constraint.*`); anything else would silently vanish on the
  * next commit and is rejected loudly. An empty value drops the key.
  */
object Alter {

  def alter(
      spark: SparkSession,
      path: String,
      addCols: Seq[(String, DataType, Option[String])] = Nil,
      props: Map[String, String] = Map.empty,
      dropCols: Seq[String] = Nil,
      renameCols: Seq[(String, String)] = Nil): Long = {
    require(GraftTable.exists(spark, path), s"not a graft table: $path")
    // a concurrent commit invalidates the snapshot the new schema DDL
    // was derived from — re-derive and retry (bounded)
    GraftWriter.retryDerived {
      alterOnce(spark, path, addCols, props, dropCols, renameCols)
    }
  }

  private def alterOnce(
      spark: SparkSession,
      path: String,
      addCols: Seq[(String, DataType, Option[String])],
      props: Map[String, String],
      dropCols: Seq[String],
      renameCols: Seq[(String, String)]): Long = {
    val table = GraftTable(spark, path)
    val snap = table.snapshot()
    var schema = snap.schema
    var mapProps = Map.empty[String, String]
    // RENAME COLUMN is metadata-only via the column mapping
    // ([[ColumnMapping]]): files keep the column's physical (creation)
    // name forever; the commit just renames the schema field and records
    // `graft.colmap.<new> = <physical>` so reads project it back
    renameCols.foreach { case (from, to) =>
      require(schema.fieldNames.exists(_.equalsIgnoreCase(from)),
        s"no such column: $from")
      require(!from.equalsIgnoreCase(to) &&
          !schema.fieldNames.exists(_.equalsIgnoreCase(to)),
        s"column $to already exists")
      require(!snap.partitionColumns.exists(_.equalsIgnoreCase(from)),
        s"cannot rename partition column $from (directory layout is physical)")
      require(!Bucketing.spec(table).exists(_._1.equalsIgnoreCase(from)),
        s"cannot rename bucket key $from (bucket layout is keyed by name)")
      requireNoConstraintOn(table, from, "rename")
      val mapping = ColumnMapping.fromProps(
        table.log.tableProperties() ++ mapProps)
      val physical = ColumnMapping.physicalName(mapping, from)
      schema = StructType(schema.fields.map { f =>
        if (f.name.equalsIgnoreCase(from)) f.copy(name = to) else f
      })
      mapProps += ColumnMapping.key(from) -> "" // drop any old mapping
      mapProps +=
        ColumnMapping.key(to) -> (if (physical == to) "" else physical)
    }
    addCols.foreach { case (name, dt, comment) =>
      require(!schema.fieldNames.exists(_.equalsIgnoreCase(name)),
        s"column $name already exists")
      val allProps = table.log.tableProperties() ++ mapProps
      val mapping = ColumnMapping.fromProps(allProps)
      val lower = name.toLowerCase(java.util.Locale.ROOT)
      // data files are keyed by PHYSICAL name: a new column whose name
      // matches a live column's physical name (e.g. ADD COLUMN a after
      // RENAME a->b) would create two physical-'a' fields and make the
      // table unreadable — mirror Delta's physical-name uniqueness rule
      val livePhys = schema.fieldNames.map(f =>
        ColumnMapping.physicalName(mapping, f).toLowerCase(java.util.Locale.ROOT)).toSet
      require(!livePhys.contains(lower),
        s"column $name collides with the physical name of an existing " +
          "column (data files are keyed by physical name)")
      // a DROPPED column's physical name still lives in old data files:
      // map the re-added column to a fresh physical identity so it reads
      // as null from pre-drop files instead of resurrecting dead data
      val dropped = ColumnMapping.droppedPhysicals(allProps)
      if (dropped.contains(lower)) {
        var n = 1
        while (livePhys.contains(s"${lower}_$n") ||
            dropped.contains(s"${lower}_$n")) n += 1
        mapProps += ColumnMapping.key(name) -> s"${name}_$n"
      }
      val f = StructField(name, dt, nullable = true)
      schema = StructType(schema.fields :+
        comment.map(f.withComment).getOrElse(f))
    }
    // DROP COLUMN is metadata-only too: reads are name-based, so data
    // files keeping the column simply stop projecting it
    dropCols.foreach { name =>
      require(schema.fieldNames.exists(_.equalsIgnoreCase(name)),
        s"no such column: $name")
      require(!snap.partitionColumns.exists(_.equalsIgnoreCase(name)),
        s"cannot drop partition column $name")
      requireNoConstraintOn(table, name, "drop")
      // the mapping dies with the column (a later ADD of the same name
      // must NOT inherit it), and the orphaned physical name is
      // tombstoned so re-adds get a fresh physical identity
      val mapping = ColumnMapping.fromProps(
        table.log.tableProperties() ++ mapProps)
      val physical = ColumnMapping.physicalName(mapping, name)
      mapProps += ColumnMapping.key(name) -> ""
      mapProps += ColumnMapping.dropKey(physical) -> "1"
      schema = StructType(
        schema.fields.filterNot(_.name.equalsIgnoreCase(name)))
      require(schema.nonEmpty, "cannot drop the last column")
    }
    props.keys.foreach { k =>
      require(k.startsWith(CommitLog.ReservedPrefix),
        s"only ${CommitLog.ReservedPrefix}* table properties persist " +
          s"across commits; got '$k'")
    }
    table.log.commit(
      operation = "ALTER TABLE",
      mode = "metadata",
      schemaDdl = schema.toDDL,
      partitionColumns = snap.partitionColumns,
      metadata = props ++ mapProps,
      operationMetrics = Map.empty,
      add = Nil,
      remove = Nil,
      expectedVersion = Some(snap.version))
  }

  /** Fail if a CHECK constraint's SQL references `name` — both dropping
    * and renaming such a column would silently break enforcement (the
    * recorded SQL text keeps the old name).
    */
  private def requireNoConstraintOn(
      table: GraftTable, name: String, verb: String): Unit = {
    val constraints = table.log.tableProperties().collect {
      case (k, sql) if k.startsWith(CommitLog.constraintKey("")) &&
          sql.toLowerCase(java.util.Locale.ROOT)
            .matches(s"(?s).*\\b${java.util.regex.Pattern.quote(name.toLowerCase(java.util.Locale.ROOT))}\\b.*") =>
        k.stripPrefix(CommitLog.constraintKey(""))
    }
    require(constraints.isEmpty,
      s"cannot $verb $name: referenced by CHECK constraint" +
        s"${if (constraints.size > 1) "s" else ""} ${constraints.mkString(", ")}")
  }
}
