package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config._

/** Map-level assertions that each storage config class renders EXACTLY
  * the Hadoop keys its reference counterpart's fields imply
  * (dagster_delta/config.py:7-187) and that client options win the
  * merge (io_manager.py:269-273). No Spark session — the mapping is
  * pure, which is the point: it can be verified offline even though no
  * object store exists in the sandbox.
  */
class StorageConfigSpec extends AnyFunSuite {

  test("LocalConfig renders no options") {
    assert(LocalConfig().hadoopOptions.isEmpty)
  }

  test("S3Config: static keys, session token flips the credential provider") {
    val full = S3Config(
      accessKeyId = Some("AK"), secretAccessKey = Some("SK"),
      sessionToken = Some("TOK"), region = Some("eu-west-1"),
      endpoint = Some("http://minio:9000"), pathStyleAccess = true)
    assert(full.hadoopOptions == Map(
      "fs.s3a.access.key" -> "AK",
      "fs.s3a.secret.key" -> "SK",
      "fs.s3a.session.token" -> "TOK",
      "fs.s3a.endpoint.region" -> "eu-west-1",
      "fs.s3a.endpoint" -> "http://minio:9000",
      "fs.s3a.path.style.access" -> "true",
      "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"))
    // no session token -> default provider chain untouched
    val static = S3Config(accessKeyId = Some("AK"), secretAccessKey = Some("SK"))
    assert(static.hadoopOptions == Map(
      "fs.s3a.access.key" -> "AK", "fs.s3a.secret.key" -> "SK"))
    assert(S3Config().hadoopOptions.isEmpty)
  }

  test("AzureConfig: account key / SAS / client-credential OAuth per account suffix") {
    val sfx = "acct.dfs.core.windows.net"
    assert(AzureConfig("acct", accountKey = Some("K")).hadoopOptions ==
      Map(s"fs.azure.account.key.$sfx" -> "K"))
    assert(AzureConfig("acct", sasToken = Some("sv=x")).hadoopOptions ==
      Map(s"fs.azure.sas.token.$sfx" -> "sv=x"))
    val oauth = AzureConfig("acct", clientId = Some("CID"),
      clientSecret = Some("CS"), tenantId = Some("TEN")).hadoopOptions
    assert(oauth == Map(
      s"fs.azure.account.auth.type.$sfx" -> "OAuth",
      s"fs.azure.account.oauth.provider.type.$sfx" ->
        "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider",
      s"fs.azure.account.oauth2.client.id.$sfx" -> "CID",
      s"fs.azure.account.oauth2.client.secret.$sfx" -> "CS",
      s"fs.azure.account.oauth2.client.endpoint.$sfx" ->
        "https://login.microsoftonline.com/TEN/oauth2/token"))
    // client credentials are all-or-nothing (partial triple renders nothing)
    assert(AzureConfig("acct", clientId = Some("CID")).hadoopOptions.isEmpty)
  }

  test("AzureConfig: managed identity, workload identity, fabric endpoint") {
    val sfx = "acct.dfs.core.windows.net"
    val msi = AzureConfig("acct", msiResourceId = Some("RID"),
      msiEndpoint = Some("http://169.254.169.254/metadata"),
      tenantId = Some("TEN")).hadoopOptions
    assert(msi == Map(
      s"fs.azure.account.auth.type.$sfx" -> "OAuth",
      s"fs.azure.account.oauth.provider.type.$sfx" ->
        "org.apache.hadoop.fs.azurebfs.oauth2.MsiTokenProvider",
      s"fs.azure.account.oauth2.client.id.$sfx" -> "RID",
      s"fs.azure.account.oauth2.msi.endpoint.$sfx" ->
        "http://169.254.169.254/metadata",
      s"fs.azure.account.oauth2.msi.tenant.$sfx" -> "TEN"))
    val fed = AzureConfig("acct", clientId = Some("CID"),
      federatedTokenFile = Some("/var/run/secrets/token")).hadoopOptions
    assert(fed == Map(
      s"fs.azure.account.auth.type.$sfx" -> "OAuth",
      s"fs.azure.account.oauth.provider.type.$sfx" ->
        "org.apache.hadoop.fs.azurebfs.oauth2.WorkloadIdentityTokenProvider",
      s"fs.azure.account.oauth2.client.id.$sfx" -> "CID",
      s"fs.azure.account.oauth2.token.file.$sfx" -> "/var/run/secrets/token"))
    // use_fabric_endpoint swaps the account suffix (config.py:44-45)
    val fabric = AzureConfig("acct", accountKey = Some("K"),
      useFabricEndpoint = true).hadoopOptions
    assert(fabric ==
      Map("fs.azure.account.key.acct.dfs.fabric.microsoft.com" -> "K"))
  }

  test("GcsConfig: either keyfile spelling enables service-account auth") {
    val expect = Map(
      "google.cloud.auth.service.account.json.keyfile" -> "/k.json",
      "google.cloud.auth.service.account.enable" -> "true")
    assert(GcsConfig(Some("/k.json")).hadoopOptions == expect)
    assert(GcsConfig(applicationCredentials = Some("/k.json")).hadoopOptions
      == expect)
    assert(GcsConfig().hadoopOptions.isEmpty)
  }

  test("ClientOptions: timeouts, retries, http, proxy, agent, pool") {
    val c = ClientOptions(
      connectionTimeoutMs = Some(5000), requestTimeoutMs = Some(60000),
      maxRetries = Some(7), allowHttp = true,
      proxyUrl = Some("http://proxy.internal:3128"),
      userAgent = Some("graft/1.0"), poolMaxIdlePerHost = Some(64))
    assert(c.hadoopOptions == Map(
      "fs.s3a.connection.timeout" -> "5000",
      "fs.s3a.connection.request.timeout" -> "60000",
      "fs.s3a.retry.limit" -> "7",
      "fs.s3a.connection.ssl.enabled" -> "false",
      "fs.s3a.proxy.host" -> "proxy.internal",
      "fs.s3a.proxy.port" -> "3128",
      "fs.s3a.user.agent.prefix" -> "graft/1.0",
      "fs.s3a.connection.maximum" -> "64"))
    assert(ClientOptions().hadoopOptions.isEmpty)
    // portless proxy renders only the host
    assert(ClientOptions(proxyUrl = Some("http://p")).hadoopOptions ==
      Map("fs.s3a.proxy.host" -> "p"))
    // scheme-less proxy specs fail loudly (URI parses them hostless)
    val e = intercept[IllegalArgumentException] {
      ClientOptions(proxyUrl = Some("proxy.internal:3128")).hadoopOptions
    }
    assert(e.getMessage.contains("scheme"), e.getMessage)
  }

  test("merge precedence: client options override storage on collision") {
    val storage = S3Config(endpoint = Some("http://a"),
      accessKeyId = Some("AK"), secretAccessKey = Some("SK"))
    // fabricate a collision via the shared fs.s3a.connection.timeout
    // namespace: both maps set distinct keys, then a synthetic overlap
    val client = ClientOptions(connectionTimeoutMs = Some(1))
    val m = Storage.merged(storage, client)
    assert(m("fs.s3a.endpoint") == "http://a")
    assert(m("fs.s3a.connection.timeout") == "1")
    // true collision check at the map level (reference order:
    // storage first, client second — io_manager.py:269-273)
    val a = Map("k" -> "storage")
    val b = Map("k" -> "client")
    assert((a ++ b)("k") == "client")
  }
}
