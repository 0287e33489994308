package graft.io

import org.apache.spark.sql.SparkSession

import graft.config.{ClientOptions, LocalConfig, Storage, StorageConfig}

/** Direct, time-travel-able table handle with credential plumbing — the
  * reference's `DeltaTableResource` (resource.py:48-77: merge
  * storage/client options, open at a pinned version). No slicing; use
  * [[graft.manager.GraftIOManager]] for slice-resolved IO.
  */
final class GraftTableResource(
    val rootUri: String,
    val storage: StorageConfig = LocalConfig(),
    val client: ClientOptions = ClientOptions()) {

  /** Open the table, applying storage credentials to the session first.
    * `version` pins time travel (resource contract: version=0 reads the
    * pre-append state — test_delta_table_resource.py:39-71).
    */
  def load(spark: SparkSession, version: Option[Long] = None): GraftTable = {
    Storage(spark, storage, client)
    val t = GraftTable(spark, rootUri)
    version.foreach(v => t.snapshot(Some(v))) // fail fast on bad version
    t
  }
}
