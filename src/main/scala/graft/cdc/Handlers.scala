package graft.cdc

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.Dataset

/** Sink interface (reference handler.go:15-17): receives one ordered
  * batch at a time; throwing fails the engine (fail-stop, reference
  * README.md:152-156). Batches are delivered strictly in log order with
  * one batch in flight (reference handler.go:8-14).
  */
trait ChangesHandler {
  def handle(changes: Dataset[Change]): Unit
}

object ChangesHandler {
  /** Function adaptor (reference handler.go:19-31). */
  def apply(f: Dataset[Change] => Unit): ChangesHandler =
    (changes: Dataset[Change]) => f(changes)
}

/** Stdout text sink (reference handlers/stdio.go:14-23): one line per
  * change, "<RFC3339Nano ts>: <table> <operation>" (change.go:28-30). */
class ConsoleHandler extends ChangesHandler {
  private val secs = DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(ZoneOffset.UTC)

  /** Go RFC3339Nano trims trailing fraction zeros (a millisecond ts
    * prints as `.567`, not `.567000000`; a whole second has no dot). */
  private[cdc] def rfc3339Nano(i: java.time.Instant): String = {
    val frac =
      if (i.getNano == 0) ""
      else "." + f"${i.getNano}%09d".reverse.dropWhile(_ == '0').reverse
    s"${secs.format(i)}${frac}Z"
  }

  override def handle(changes: Dataset[Change]): Unit =
    changes.collect().foreach { c =>
      // Ordered delivery is driver-side by contract (SURVEY.md §2.6 O3):
      // the batch is already small (maxBatchSize) and ordered.
      println(s"${rfc3339Nano(c.timestamp.toInstant)}: ${c.table} ${c.operation}")
    }
}

/** Stdout JSON sink (reference handlers/debug.go:15-28): one JSON object
  * per change per line. */
class JsonConsoleHandler extends ChangesHandler {
  override def handle(changes: Dataset[Change]): Unit =
    changes.toJSON.collect().foreach(println)
}

/** HTTP POST sink (reference handlers/http.go:41-74): POSTs a
  * {"changes":[...]} envelope per batch; any non-2xx response is an
  * error, which fail-stops the engine — delivery is driver-side and
  * single-threaded, preserving the ordered at-least-once contract. */
class HttpPostHandler(endpoint: String,
    client: HttpClient = HttpClient.newHttpClient()) extends ChangesHandler {
  override def handle(changes: Dataset[Change]): Unit = {
    val body = changes.toJSON.collect().mkString("{\"changes\":[", ",", "]}")
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new RuntimeException(
        s"HTTP sink: ${resp.statusCode()} from $endpoint: ${resp.body().take(500)}")
  }
}

/** In-memory recording sink for tests (reference trigger_test.go:535-560). */
class RecordingHandler extends ChangesHandler {
  val batches = scala.collection.mutable.ArrayBuffer[Seq[Change]]()
  override def handle(changes: Dataset[Change]): Unit =
    batches.synchronized { batches += changes.collect().toSeq }
  def all: Seq[Change] = batches.synchronized { batches.flatten.toSeq }
}
