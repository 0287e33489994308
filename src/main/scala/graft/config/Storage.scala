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
  *
  * Reference fields that are delta-rs `object_store` client knobs with
  * no Hadoop-filesystem analog are intentionally NOT mapped (mapping
  * them to unrelated keys would be worse than omitting them):
  * S3 `imdsv1_fallback`, `unsigned_payload`, `checksum`,
  * `copy_if_not_exists`, `metadata_endpoint`,
  * `container_credentials_relative_uri`; client `http1_only`,
  * `http2_*`, `default_content_type`, `allow_invalid_certificates`,
  * `pool_idle_timeout`. S3A reads the ECS/IMDS credential chain and
  * checksumming from its own provider chain instead.
  */
sealed trait StorageConfig {
  /** Hadoop configuration key/value pairs for this backend. */
  def hadoopOptions: Map[String, String]
}

final case class LocalConfig() extends StorageConfig {
  def hadoopOptions: Map[String, String] = Map.empty
}

/** S3-compatible store (reference `S3Config`, config.py:57-112):
  * credentials, region, custom endpoint (MinIO/lakeFS S3 gateway),
  * path-style access. `virtual_hosted_style_request` is the inverse of
  * path-style; both render to `fs.s3a.path.style.access`.
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

/** Azure ADLS/Blob (reference `AzureConfig`, config.py:13-55). Auth
  * modes in ABFS precedence order: account key, SAS token, OAuth client
  * credentials, OAuth managed identity (`msi_*`), OAuth workload
  * identity (`federated_token_file`). `use_fabric_endpoint` swaps the
  * account suffix to `dfs.fabric.microsoft.com` (config.py:44-45).
  */
final case class AzureConfig(
    accountName: String,
    accountKey: Option[String] = None,
    sasToken: Option[String] = None,
    clientId: Option[String] = None,
    clientSecret: Option[String] = None,
    tenantId: Option[String] = None,
    msiResourceId: Option[String] = None,
    msiEndpoint: Option[String] = None,
    federatedTokenFile: Option[String] = None,
    useFabricEndpoint: Boolean = false) extends StorageConfig {
  private def suffix =
    if (useFabricEndpoint) s"$accountName.dfs.fabric.microsoft.com"
    else s"$accountName.dfs.core.windows.net"
  private def oauth(providerClass: String, extra: Map[String, String]) = Map(
    s"fs.azure.account.auth.type.$suffix" -> "OAuth",
    s"fs.azure.account.oauth.provider.type.$suffix" ->
      s"org.apache.hadoop.fs.azurebfs.oauth2.$providerClass") ++ extra
  def hadoopOptions: Map[String, String] = Map.empty[String, String] ++
    accountKey.map(k => s"fs.azure.account.key.$suffix" -> k) ++
    sasToken.map(t => s"fs.azure.sas.token.$suffix" -> t) ++
    (for { id <- clientId; sec <- clientSecret; ten <- tenantId } yield
      oauth("ClientCredsTokenProvider", Map(
        s"fs.azure.account.oauth2.client.id.$suffix" -> id,
        s"fs.azure.account.oauth2.client.secret.$suffix" -> sec,
        s"fs.azure.account.oauth2.client.endpoint.$suffix" ->
          s"https://login.microsoftonline.com/$ten/oauth2/token"
      ))).getOrElse(Map.empty) ++
    // managed identity: user-assigned identity id rides the client.id
    // key, the custom IMDS endpoint its msi.endpoint key
    (if (msiResourceId.isDefined || msiEndpoint.isDefined)
      oauth("MsiTokenProvider", Map.empty[String, String] ++
        msiResourceId.map(s"fs.azure.account.oauth2.client.id.$suffix" -> _) ++
        msiEndpoint.map(s"fs.azure.account.oauth2.msi.endpoint.$suffix" -> _) ++
        tenantId.map(s"fs.azure.account.oauth2.msi.tenant.$suffix" -> _))
    else Map.empty) ++
    // workload (federated) identity: token file + client/tenant ids
    federatedTokenFile.map(f =>
      oauth("WorkloadIdentityTokenProvider", Map.empty[String, String] ++
        clientId.map(s"fs.azure.account.oauth2.client.id.$suffix" -> _) ++
        tenantId.map(s"fs.azure.account.oauth2.msi.tenant.$suffix" -> _) +
        (s"fs.azure.account.oauth2.token.file.$suffix" -> f))
    ).getOrElse(Map.empty)
}

/** GCS (reference `GcsConfig`, config.py:113-127): `service_account`
  * and `application_credentials` are both keyfile paths (delta-rs
  * accepts either spelling); the GCS connector takes one keyfile key.
  */
final case class GcsConfig(
    serviceAccountJsonPath: Option[String] = None,
    applicationCredentials: Option[String] = None) extends StorageConfig {
  private def keyfile = serviceAccountJsonPath.orElse(applicationCredentials)
  def hadoopOptions: Map[String, String] = Map.empty[String, String] ++
    keyfile.map("google.cloud.auth.service.account.json.keyfile" -> _) ++
    keyfile.map(_ => "google.cloud.auth.service.account.enable" -> "true")
}

/** HTTP-client tuning options carried alongside the backend config
  * (reference `ClientConfig`, config.py:130-187: timeouts/retries/proxy
  * merged into storage options, io_manager.py:267-273).
  */
final case class ClientOptions(
    connectionTimeoutMs: Option[Long] = None,
    requestTimeoutMs: Option[Long] = None,
    maxRetries: Option[Int] = None,
    allowHttp: Boolean = false,
    proxyUrl: Option[String] = None,
    userAgent: Option[String] = None,
    poolMaxIdlePerHost: Option[Int] = None) {
  def hadoopOptions: Map[String, String] = Map.empty[String, String] ++
    connectionTimeoutMs.map(t => "fs.s3a.connection.timeout" -> t.toString) ++
    requestTimeoutMs.map(t => "fs.s3a.connection.request.timeout" -> t.toString) ++
    maxRetries.map(r => "fs.s3a.retry.limit" -> r.toString) ++
    (if (allowHttp) Map("fs.s3a.connection.ssl.enabled" -> "false") else Map.empty) ++
    proxyUrl.toSeq.flatMap { u =>
      val uri = new java.net.URI(u)
      // a scheme-less "host:port" parses as URI(scheme=host, host=null) —
      // a null host would reach Configuration.set and crash with an
      // error that never mentions the proxy
      require(uri.getHost != null,
        s"proxyUrl '$u' has no host — include the scheme, e.g. http://proxy:3128")
      Seq("fs.s3a.proxy.host" -> uri.getHost) ++
        (if (uri.getPort > 0) Seq("fs.s3a.proxy.port" -> uri.getPort.toString)
         else Nil)
    } ++
    userAgent.map("fs.s3a.user.agent.prefix" -> _) ++
    poolMaxIdlePerHost.map(n => "fs.s3a.connection.maximum" -> n.toString)
}

object Storage {
  /** Backend + client options merged, client options winning on key
    * collision (the reference's merge order, io_manager.py:269-273).
    */
  def merged(
      storage: StorageConfig,
      client: ClientOptions = ClientOptions()): Map[String, String] =
    storage.hadoopOptions ++ client.hadoopOptions

  /** Apply the merged options to the live Hadoop configuration. */
  def apply(
      spark: SparkSession,
      storage: StorageConfig,
      client: ClientOptions = ClientOptions()): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    merged(storage, client).foreach { case (k, v) => conf.set(k, v) }
  }
}
