package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Schema-alignment helpers shared by merge schema evolution and the
  * change-data feed: old files read columns they predate as typed
  * nulls, so padding a DataFrame to a (super)schema is the one move
  * both features are built on.
  */
private[graft] object Schemas {

  /** Add any `schema` column `df` lacks as a typed null; existing
    * columns (and any extras) are left untouched, order unchanged.
    */
  def padTo(df: DataFrame, schema: StructType): DataFrame =
    schema.foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }

  /** [[padTo]] + project to exactly the schema's columns, in order. */
  def conformTo(df: DataFrame, schema: StructType): DataFrame =
    padTo(df, schema).select(schema.map(f => col(f.name)): _*)
}
