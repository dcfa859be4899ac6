package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.functions.TextFns

/** O3 `query_ollama` + O4 `route` as distributed operators
  * (reference: ollama_router.py:58-130).
  *
  * The reference is a per-call HTTP client: POST
  * `{model, prompt, stream}` to `<base>/api/generate`, parse the JSON
  * reply, raise ConnectionError when unreachable. At cluster scale the
  * same semantics become a `mapPartitions` batch: ONE pooled client per
  * partition (connection reuse across the partition's rows — the
  * per-row-client alternative would TCP-handshake per document), rows
  * streamed through it lazily, client lifetime = partition lifetime.
  *
  * The HTTP hop is behind an injectable [[Transport]] so the operator
  * is testable without a server (the reference mocks urlopen the same
  * way, tests/test_ollama_router.py:68-97) and honest in a zero-egress
  * container: the default JDK transport is real code but only a test
  * fake ever runs here.
  */
object OllamaRouter {

  /** One POST: (url, jsonBody) => jsonResponse. Implementations must be
    * serializable (shipped to executors); create per-partition state
    * (sockets, pools) lazily inside the implementation, not in the
    * closure. */
  trait Transport extends Serializable {
    def post(url: String, jsonBody: String): String
  }

  /** Real JDK HttpClient transport — one client per instance, hence one
    * per partition; java.net.http pools and reuses connections per
    * client. Unreachable server → ConnectionError-equivalent
    * (ollama_router.py:96-99). */
  final class JdkTransport(timeoutSec: Int = 120) extends Transport {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSec.toLong)).build()
    def post(url: String, jsonBody: String): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSec.toLong))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(jsonBody))
        .build()
      try client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      catch { case e: java.io.IOException =>
        throw new java.net.ConnectException(
          s"Cannot reach Ollama at $url. Is 'ollama serve' running? (${e.getMessage})")
      }
    }
  }

  /** Reference defaults (ollama_router.py:28-31): env-overridable base
    * URL and model. */
  def defaultBaseUrl: String =
    sys.env.getOrElse("OLLAMA_BASE_URL", "http://localhost:11434")
  def defaultModel: String = sys.env.getOrElse("OLLAMA_MODEL", "llama3")

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** The exact request body the reference sends (ollama_router.py:101-106). */
  def payload(prompt: String, model: String, stream: Boolean = false): String =
    s"""{"model": ${jsonStr(model)}, "prompt": ${jsonStr(prompt)}, "stream": $stream}"""

  /** `query_ollama` over a column of prompts: appends `responseCol`
    * holding the raw JSON reply (parse downstream with `from_json` —
    * keeping the hop and the parse separate keeps the HTTP stage
    * schema-free). One transport per partition.
    *
    * Delivery is AT-LEAST-ONCE per row: Spark re-executes the stage on
    * task retry, speculation, or when a downstream wide op re-evaluates
    * the plan (e.g. a global sort's range-sampling pass). Persist the
    * result (or write it out) before wide transformations if duplicate
    * calls matter. */
  def queryOllama(
      df: DataFrame,
      promptCol: String,
      responseCol: String = "response",
      model: String = defaultModel,
      baseUrl: String = defaultBaseUrl,
      transport: Transport = new JdkTransport()): DataFrame = {
    val url = s"$baseUrl/api/generate"
    val m = model
    val outSchema = StructType(df.schema.fields :+
      StructField(responseCol, StringType, nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(promptCol)
    df.mapPartitions { rows =>
      // partition-scoped client: connection pool shared by all rows here
      val t = transport
      rows.map { row =>
        val prompt = row.getString(idx)
        val resp =
          if (prompt == null) null
          else t.post(url, payload(prompt, m))
        Row.fromSeq(row.toSeq :+ resp)
      }
    }(enc)
  }

  /** O4 `route` (ollama_router.py:109-130) end-to-end: detect the
    * trigger (column algebra, no HTTP), strip triggers, and send ONLY
    * the routed rows through the transport — non-routed rows get a null
    * response without touching the network, exactly the reference's
    * early return. */
  def route(
      df: DataFrame,
      textCol: String,
      model: String = defaultModel,
      baseUrl: String = defaultBaseUrl,
      transport: Transport = new JdkTransport()): DataFrame = {
    val (trig, routed, prompt) = TextFns.routeCols(col(textCol))
    val tagged = df
      .withColumn("trigger", trig)
      .withColumn("routed", routed)
      .withColumn("__prompt", when(routed, prompt))
    queryOllama(tagged, "__prompt", "response", model, baseUrl, transport)
      .drop("__prompt")
  }
}
