package graft.io

import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.log.{CommitLog, Snapshot}

/** Log-level column name mapping — what makes `ALTER TABLE RENAME
  * COLUMN` a metadata-only commit on a 100 TB table (the Delta
  * column-mapping analog; reference surface: delta-rs exposes the same
  * through table metadata rather than file rewrites).
  *
  * Invariant: data files ALWAYS carry a column's '''physical''' name —
  * the name it was created under, fixed for the column's lifetime. A
  * rename only changes the '''logical''' (schema) name and records
  * `graft.colmap.<logical> = <physical>` in the carried-forward table
  * properties. Readers project physical → logical over the scan; writers
  * rename logical → physical immediately before staging parquet. Footer
  * statistics are therefore always keyed by physical name, matching what
  * the pushed-down scan filters reference after Catalyst substitutes the
  * projection aliases.
  *
  * The mapping rides every commit's metadata (the commit log carries
  * `graft.*` properties forward), so time travel to a pre-rename version
  * sees that version's names — resolve the mapping from the SNAPSHOT
  * being read, not from the latest commit.
  */
object ColumnMapping {

  /** `graft.colmap.<logical-lowercased>` → physical name. */
  val Prefix: String = CommitLog.ReservedPrefix + "colmap."

  def key(logical: String): String = Prefix + logical.toLowerCase(Locale.ROOT)

  /** `graft.coldrop.<physical-lowercased>` = "1": tombstone for a
    * physical column name that historical data files still carry after
    * its logical column was dropped. ADD COLUMN consults these so a
    * re-added column of the same name gets a FRESH physical identity —
    * otherwise pre-drop files would resurrect the dropped column's data
    * under the new column (silent wrong data, garbage if the type
    * changed).
    */
  val DropPrefix: String = CommitLog.ReservedPrefix + "coldrop."

  def dropKey(physical: String): String =
    DropPrefix + physical.toLowerCase(Locale.ROOT)

  /** Lowercased physical names of dropped columns still present in
    * historical files.
    */
  def droppedPhysicals(props: Map[String, String]): Set[String] =
    props.collect {
      case (k, v) if k.startsWith(DropPrefix) && v.nonEmpty =>
        k.stripPrefix(DropPrefix)
    }.toSet

  /** logical(lowercased) → physical, from carried-forward properties. */
  def fromProps(props: Map[String, String]): Map[String, String] =
    props.collect {
      case (k, v) if k.startsWith(Prefix) && v.nonEmpty =>
        k.stripPrefix(Prefix) -> v
    }

  /** The mapping as of a snapshot's version (correct under time
    * travel — properties are re-persisted on every commit).
    */
  def fromSnapshot(snap: Snapshot): Map[String, String] =
    fromProps(snap.commits.last.metadata)

  def physicalName(mapping: Map[String, String], logical: String): String =
    mapping.getOrElse(logical.toLowerCase(Locale.ROOT), logical)

  /** `schema` with every field renamed to its physical name. */
  def physicalSchema(schema: StructType, mapping: Map[String, String]): StructType =
    if (mapping.isEmpty) schema
    else StructType(schema.map(f => f.copy(name = physicalName(mapping, f.name))))

  /** Rename renamed columns logical → physical immediately before a
    * parquet stage write (no-op select when the table has no renames).
    */
  def toPhysical(df: DataFrame, mapping: Map[String, String]): DataFrame =
    if (mapping.isEmpty || !df.columns.exists(c =>
        mapping.contains(c.toLowerCase(Locale.ROOT)))) df
    else df.select(df.columns.toIndexedSeq.map(c =>
      col(c).as(physicalName(mapping, c))): _*)
}
