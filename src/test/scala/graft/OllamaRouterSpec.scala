package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.operators.OllamaRouter

/** O3/O4 distributed router parity against the reference's mocked-HTTP
  * tests (tests/test_ollama_router.py:68-143): payload shape, routed
  * vs non-routed rows, trigger stripping before sending, and the
  * connection-error path. The fake transport records every request the
  * operator issues — the Scala analogue of `mock.patch(urlopen)`. */
/** Serializable recording fake: every post lands in a static queue
  * (test JVM = executor JVM under local[*]). Top-level class — an
  * inner class would capture the non-serializable Spec as $outer. */
private class FakeTransport(reply: String) extends OllamaRouter.Transport {
  def post(url: String, jsonBody: String): String = {
    FakeTransport.calls.add(url -> jsonBody)
    reply
  }
}
private object FakeTransport {
  val calls = new ConcurrentLinkedQueue[(String, String)]()
}

private class RefusingTransport extends OllamaRouter.Transport {
  def post(url: String, body: String): String =
    throw new java.net.ConnectException(s"Cannot reach Ollama at $url")
}

class OllamaRouterSpec extends SparkSpec {
  import spark.implicits._

  private val fakeReply =
    """{"model": "llama3", "response": "Hello!", "done": true}"""

  test("query_ollama posts the reference payload to /api/generate (:79-92)") {
    FakeTransport.calls.clear()
    val out = OllamaRouter.queryOllama(
      Seq("hello").toDF("prompt"), "prompt",
      model = "llama3", baseUrl = "http://localhost:11434",
      transport = new FakeTransport(fakeReply))
    assert(out.select("response").as[String].collect().toSeq == Seq(fakeReply))
    val (url, body) = FakeTransport.calls.asScala.head
    assert(url == "http://localhost:11434/api/generate")
    assert(body == """{"model": "llama3", "prompt": "hello", "stream": false}""")
  }

  test("route: trigger rows routed, others get null response, no HTTP (:109-143)") {
    FakeTransport.calls.clear()
    val df = Seq(
      (1L, "@ollama what is 2+2?"),
      (2L, "no mention here"),
      (3L, "@copilot explain recursion")).toDF("id", "text")
    // collect unsorted, sort locally: a global orderBy would re-execute
    // the transport stage for the RangePartitioner's sampling pass (see
    // the operator's scaladoc — the HTTP hop is at-least-once)
    val out = OllamaRouter.route(df, "text",
        model = "llama3", baseUrl = "http://x",
        transport = new FakeTransport(fakeReply))
      .select($"id", $"trigger", $"routed", $"response")
      .collect().sortBy(_.getLong(0))
    assert(out(0).getString(1) == "@ollama" && out(0).getBoolean(2)
      && out(0).getString(3) == fakeReply)
    assert(out(1).getString(1) == "" && !out(1).getBoolean(2)
      && out(1).isNullAt(3))
    assert(out(2).getString(1) == "@copilot" && out(2).getBoolean(2)
      && out(2).getString(3) == fakeReply)
    // exactly the two routed rows hit the transport, triggers stripped
    val bodies = FakeTransport.calls.asScala.map(_._2).toSeq.sorted
    assert(bodies.size == 2)
    assert(bodies.exists(b => b.contains("what is 2+2?") && !b.contains("@ollama")))
    assert(bodies.exists(b => b.contains("explain recursion") && !b.contains("@copilot")))
  }

  test("payload escapes JSON specials") {
    assert(OllamaRouter.payload("a\"b\\c\nd", "m") ==
      """{"model": "m", "prompt": "a\"b\\c\nd", "stream": false}""")
  }

  test("unreachable server raises a ConnectException per-row (:95-99)") {
    val e = intercept[org.apache.spark.SparkException] {
      OllamaRouter.queryOllama(Seq("ping").toDF("prompt"), "prompt",
        baseUrl = "http://localhost:1",
        transport = new RefusingTransport).collect()
    }
    assert(e.getMessage.contains("Cannot reach Ollama")
      || Option(e.getCause).exists(_.getMessage.contains("Cannot reach Ollama")))
  }

  // ------------------------------------------------------------------
  // Loopback-HTTP tests (VERDICT r10 #6): a real com.sun.net.httpserver
  // on 127.0.0.1 drives the REAL pooled JdkTransport end-to-end — the
  // JDK-client/pool/timeout/error-mapping code the fake transport
  // bypasses. The reference's mocked urlopen asserts are the floor
  // (tests/test_ollama_router.py:77-90); a live socket is the ceiling.
  // No egress: everything stays on the loopback interface.
  // ------------------------------------------------------------------

  private def withLoopbackServer(
      handler: com.sun.net.httpserver.HttpExchange => Unit)(
      body: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", ex => handler(ex))
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("JdkTransport end-to-end: real POST, payload shape, pooled reuse") {
    LoopbackLog.clear()
    withLoopbackServer { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      LoopbackLog.record(ex.getRequestMethod, ex.getRequestURI.getPath,
        ex.getRequestHeaders.getFirst("Content-Type"), body)
      val reply = fakeReply.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, reply.length.toLong)
      ex.getResponseBody.write(reply)
      ex.close()
    } { base =>
      // coalesce(1): ONE partition → ONE JdkTransport → one pooled
      // client serving both rows (the per-partition lifecycle under test)
      val out = OllamaRouter.queryOllama(
        Seq("hello", "again").toDF("prompt").coalesce(1), "prompt",
        model = "llama3", baseUrl = base,
        transport = new OllamaRouter.JdkTransport(timeoutSec = 10))
      assert(out.select("response").as[String].collect().toSeq ==
        Seq(fakeReply, fakeReply))
      val calls = LoopbackLog.snapshot()
      assert(calls.size == 2)
      calls.foreach { case (method, path, ctype, _) =>
        assert(method == "POST" && path == "/api/generate"
          && ctype == "application/json")
      }
      assert(calls.map(_._4).toSet == Set(
        """{"model": "llama3", "prompt": "hello", "stream": false}""",
        """{"model": "llama3", "prompt": "again", "stream": false}"""))
    }
  }

  test("JdkTransport timeout maps to the ConnectionError-equivalent (:96-99)") {
    withLoopbackServer { ex =>
      Thread.sleep(3000) // beyond the 1 s client timeout
      ex.sendResponseHeaders(200, -1)
      ex.close()
    } { base =>
      val e = intercept[org.apache.spark.SparkException] {
        OllamaRouter.queryOllama(Seq("slow").toDF("prompt"), "prompt",
          baseUrl = base,
          transport = new OllamaRouter.JdkTransport(timeoutSec = 1)
        ).collect()
      }
      def msgs(t: Throwable): Seq[String] = Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("Cannot reach Ollama")),
        msgs(e).mkString("; "))
    }
  }

  test("JdkTransport against a dead port maps to the ConnectionError-equivalent") {
    // bind-then-close guarantees an unbound loopback port
    val sock = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    val deadPort = sock.getLocalPort
    sock.close()
    val e = intercept[org.apache.spark.SparkException] {
      OllamaRouter.queryOllama(Seq("ping").toDF("prompt"), "prompt",
        baseUrl = s"http://127.0.0.1:$deadPort",
        transport = new OllamaRouter.JdkTransport(timeoutSec = 2)).collect()
    }
    def msgs(t: Throwable): Seq[String] = Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("Cannot reach Ollama")),
      msgs(e).mkString("; "))
  }
}

/** Server-side request log for the loopback tests — static because the
  * handler runs in the server thread, not the Spark task. */
private object LoopbackLog {
  private val calls =
    new ConcurrentLinkedQueue[(String, String, String, String)]()
  def clear(): Unit = calls.clear()
  def record(method: String, path: String, ctype: String, body: String): Unit =
    calls.add((method, path, ctype, body))
  def snapshot(): Seq[(String, String, String, String)] =
    calls.asScala.toSeq
}
