package graft.config

import org.apache.spark.sql.SparkSession

/** Storage backend configuration (reference surface:
  * dagster_delta/config.py:7-187 — local/S3/Azure/GCS credential and
  * endpoint plumbing into the object store client; option merging at
  * io_manager.py:252-273, resource.py:54-71).
  *
  * Spark-natively, object-store credentials are Hadoop filesystem confs;
  * each backend renders its options to `fs.*` keys and [[Storage.apply]]
  * sets them on the session's Hadoop configuration. Correctness at
  * sf-scale is local-FS only (no egress in this environment); the mapping
  * is the 100 TB deployment surface.
  */
sealed trait StorageConfig {
  /** Hadoop configuration key/value pairs for this backend. */
  def hadoopOptions: Map[String, String]
}

final case class LocalConfig() extends StorageConfig {
  def hadoopOptions: Map[String, String] = Map.empty
}

/** S3-compatible store (reference `S3Config`): credentials, region,
  * custom endpoint (MinIO/lakeFS S3 gateway), path-style access.
  */
final case class S3Config(
    accessKeyId: Option[String] = None,
    secretAccessKey: Option[String] = None,
    sessionToken: Option[String] = None,
    region: Option[String] = None,
    endpoint: Option[String] = None,
    pathStyleAccess: Boolean = false,
    allowUnsafeRename: Boolean = false) extends StorageConfig {
  def hadoopOptions: Map[String, String] = Map.empty[String, String] ++
    accessKeyId.map("fs.s3a.access.key" -> _) ++
    secretAccessKey.map("fs.s3a.secret.key" -> _) ++
    sessionToken.map("fs.s3a.session.token" -> _) ++
    region.map("fs.s3a.endpoint.region" -> _) ++
    endpoint.map("fs.s3a.endpoint" -> _) ++
    (if (pathStyleAccess) Map("fs.s3a.path.style.access" -> "true") else Map.empty) ++
    sessionToken.map(_ => "fs.s3a.aws.credentials.provider" ->
      "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")
}

/** Azure ADLS/Blob (reference `AzureConfig`). */
final case class AzureConfig(
    accountName: String,
    accountKey: Option[String] = None,
    sasToken: Option[String] = None,
    clientId: Option[String] = None,
    clientSecret: Option[String] = None,
    tenantId: Option[String] = None) extends StorageConfig {
  private def suffix = s"$accountName.dfs.core.windows.net"
  def hadoopOptions: Map[String, String] = Map.empty[String, String] ++
    accountKey.map(k => s"fs.azure.account.key.$suffix" -> k) ++
    sasToken.map(t => s"fs.azure.sas.token.$suffix" -> t) ++
    (for { id <- clientId; sec <- clientSecret; ten <- tenantId } yield Map(
      s"fs.azure.account.auth.type.$suffix" -> "OAuth",
      s"fs.azure.account.oauth.provider.type.$suffix" ->
        "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider",
      s"fs.azure.account.oauth2.client.id.$suffix" -> id,
      s"fs.azure.account.oauth2.client.secret.$suffix" -> sec,
      s"fs.azure.account.oauth2.client.endpoint.$suffix" ->
        s"https://login.microsoftonline.com/$ten/oauth2/token"
    )).getOrElse(Map.empty)
}

/** GCS (reference `GcsConfig`). */
final case class GcsConfig(serviceAccountJsonPath: Option[String] = None)
    extends StorageConfig {
  def hadoopOptions: Map[String, String] = Map.empty[String, String] ++
    serviceAccountJsonPath.map("google.cloud.auth.service.account.json.keyfile" -> _) ++
    serviceAccountJsonPath.map(_ => "google.cloud.auth.service.account.enable" -> "true")
}

/** HTTP-client tuning options carried alongside the backend config
  * (reference `ClientConfig`: timeouts/retries merged into storage
  * options, io_manager.py:267-273).
  */
final case class ClientOptions(
    connectionTimeoutMs: Option[Long] = None,
    maxRetries: Option[Int] = None) {
  def hadoopOptions: Map[String, String] = Map.empty[String, String] ++
    connectionTimeoutMs.map(t => "fs.s3a.connection.timeout" -> t.toString) ++
    maxRetries.map(r => "fs.s3a.retry.limit" -> r.toString)
}

object Storage {
  /** Merge backend + client options into the live Hadoop configuration
    * (client options win on key collision, mirroring the reference's
    * merge order).
    */
  def apply(
      spark: SparkSession,
      storage: StorageConfig,
      client: ClientOptions = ClientOptions()): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    (storage.hadoopOptions ++ client.hadoopOptions).foreach {
      case (k, v) => conf.set(k, v)
    }
  }
}
