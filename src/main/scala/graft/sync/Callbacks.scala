package graft.sync

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.core.{CommitCallback, CommitMetadata, Instant, Json}

/** The JSON body an HTTP commit callback posts (reference analog:
  * callback/common/HoodieWriteCommitCallbackMessage.java:28 — commit
  * time, table name, base path; we add the action/operation and row
  * counts, which the reference's consumers derive separately). */
case class CommitCallbackMessage(
    tableName: String,
    basePath: String,
    commitTime: String,
    action: String,
    operation: String,
    totalRows: Long,
    totalFiles: Int)

/** HTTP binding of the [[graft.core.CommitCallback]] seam (reference
  * analog: callback/impl/HoodieWriteCommitHttpCallback.java:38 +
  * client/HoodieWriteCommitHttpCallbackClient.java:44): POST one JSON
  * message per published instant. Failures propagate to the caller —
  * the commit itself is already durable (same contract as the in-JVM
  * callbacks), so the writer decides whether notification loss is
  * fatal. An `apiKey` travels in the same header the reference uses. */
class HttpCommitCallback(
    url: String,
    tableName: String,
    basePath: String,
    apiKey: String = "",
    timeoutMs: Long = 5000L) extends CommitCallback {

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()

  override def onCommit(instant: Instant, meta: CommitMetadata): Unit = {
    val body = Json.write(CommitCallbackMessage(
      tableName, basePath, instant.time, instant.action, meta.operation,
      totalRows = meta.stats.map(_.rows).sum,
      totalFiles = meta.stats.size))
    val builder = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    val req = (if (apiKey.nonEmpty)
      builder.header("X-Graft-Callback-Key", apiKey) else builder).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"commit callback POST $url returned ${resp.statusCode()}: ${resp.body()}")
  }
}
