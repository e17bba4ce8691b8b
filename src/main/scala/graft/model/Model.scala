package graft.model

/**
 * Engine data model (SURVEY.md §1.2, BASELINE.json input_hint).
 *
 * The document payload is an interleaved text+media span table:
 *   documents(doc_id STRING, spans ARRAY<STRUCT<kind,text,media_ref,offset>>)
 * generalising the reference's `(Vec<Url>, Vec<D>)` extraction product
 * (worker/src/extractor/html.rs:21-28).
 */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

object Span {
  val Text = "text"
  val Media = "media"
  val Link = "link"
}

final case class Document(doc_id: String, spans: Seq[Span])

/** Unit of crawl work — the reference's `Task` (worker/src/task.rs:6-9)
 * widened with scheduling state per north_rule. */
final case class Task(
    url: String,
    host: String,
    priority: Int,
    next_fetch: Long, // epoch millis; with priority forms the queue key
    retry_count: Int,
    gen: Int
)

/** Per-task outcome (reference: worker/src/traits.rs:30-34 +
 * error-kind → outcome maps in errors.rs:89-183). */
object Outcome {
  val Ok = "ok"
  val Err = "err"       // InvalidTask/InvalidURL/InvalidPage/Parsing/InvalidData
  val Reject = "reject" // Network/Unreachable — reschedulable
}

final case class TaskOutcome(gen: Int, url: String, outcome: String, error_kind: String)

/** Per-generation per-stage accounting (reference: metrics/influx_client.rs). */
final case class StageMetric(gen: Int, stage: String, rows_in: Long, rows_out: Long, wall_ms: Long)
