package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.pipeline.HttpAlertSink
import graft.streaming.{SigV4, SqsClient, SqsInboxBridge}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Contract tests for the two egress adapters (Slack webhook alert
  * sink, SQS receive/delete client) against LOCAL HTTP stubs — this
  * container has zero egress, so the stubs pin the wire contract the
  * production endpoints would see: request shape, auth signature,
  * delete-after-durable-write ordering, redelivery idempotence.
  */
class EgressAdapterSpecs extends AnyFunSuite {

  private def withServer(f: (HttpServer, String) => Unit): Unit = {
    val srv = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.start()
    try f(srv, s"http://127.0.0.1:${srv.getAddress.getPort}")
    finally srv.stop(0)
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  // ---- Slack webhook sink ----------------------------------------------

  test("HttpAlertSink posts the Slack webhook JSON; payload is escaped; non-2xx is swallowed") {
    withServer { (srv, base) =>
      val posts = new ConcurrentLinkedQueue[(String, String)]
      srv.createContext("/hook", (ex: HttpExchange) => {
        posts.add((ex.getRequestHeaders.getFirst("Content-type"), readBody(ex)))
        respond(ex, 200, "ok")
      })
      srv.createContext("/dead", (ex: HttpExchange) => respond(ex, 500, "boom"))

      val sink = new HttpAlertSink(s"$base/hook")
      sink.alert("run_7", "persist", "step \"failed\"\nbadly")
      val (ctype, body) = posts.asScala.head
      assert(ctype === "application/json")
      // valid JSON (Jackson parses it) with the escaped message intact
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      val text = node.get("text").asText()
      assert(text.contains("run=run_7") && text.contains("step=persist"))
      assert(text.contains("step \"failed\"\nbadly"))

      // a dead webhook must not throw into the failing pipeline
      new HttpAlertSink(s"$base/dead").alert("r", "s", "e")
      // and an unreachable host must not either
      new HttpAlertSink("http://127.0.0.1:1/hook",
        timeout = java.time.Duration.ofMillis(200)).alert("r", "s", "e")
    }
  }

  test("a failing pipeline run fires the Slack webhook end-to-end (dag_utils TODO over HTTP)") {
    withServer { (srv, base) =>
      val posts = new ConcurrentLinkedQueue[String]
      srv.createContext("/hook", (ex: HttpExchange) => {
        posts.add(readBody(ex)); respond(ex, 200, "ok")
      })
      val spark = TestSessions.spark
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("httpalert")
      val spec = graft.pipeline.PipelineRunner.PipelineSpec(
        runId = "run_http",
        mappings = Map("bad" -> Seq(
          graft.operators.FieldMapping("assert_true(x < 0, 'boom')", "chk"),
          graft.operators.FieldMapping("x", "x"))),
        sinkDir = dir.resolve("sink").toString)
      intercept[Exception] {
        graft.pipeline.PipelineRunner.run(spark, Map("bad" -> Seq(1L, 2L).toDF("x")),
          spec, new HttpAlertSink(s"$base/hook"))
      }
      // listener delivery is async; bounded wait for the webhook post
      val deadline = System.nanoTime() + 30e9.toLong
      while (posts.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(posts.asScala.exists(b => b.contains("run_http") && b.contains("bad")),
        posts.asScala.toSeq.toString)
    }
  }

  // ---- SQS client -------------------------------------------------------

  /** In-memory queue stub speaking the SQS JSON 1.0 protocol, with
    * receipt handles and SigV4 verification (recomputes the signature
    * with the shared secret; a tampered body or missing header fails).
    */
  private final class SqsStub(secretKey: String) {
    val pending = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)] // (id, body)
    val inflight = new java.util.concurrent.ConcurrentHashMap[String, (String, String)] // handle -> (id, body)
    val deleted = new ConcurrentLinkedQueue[String]
    var rejectUnsigned = true
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private var n = 0

    def enqueue(body: String): String = { n += 1; val id = s"m$n"; pending.add((id, body)); id }

    def handler(ex: HttpExchange): Unit = {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val target = ex.getRequestHeaders.getFirst("X-amz-target")
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      if (rejectUnsigned && !verify(ex, auth, body)) { respond(ex, 403, """{"__type":"AccessDenied"}"""); return }
      val req = mapper.readTree(body)
      target match {
        case "AmazonSQS.ReceiveMessage" =>
          val max = req.path("MaxNumberOfMessages").asInt(1)
          val out = mapper.createObjectNode()
          val arr = out.putArray("Messages")
          var i = 0
          while (i < max && !pending.isEmpty) {
            val (id, b) = pending.poll()
            val handle = s"rh-$id-${java.util.UUID.randomUUID()}"
            inflight.put(handle, (id, b))
            val m = arr.addObject()
            m.put("MessageId", id); m.put("ReceiptHandle", handle); m.put("Body", b)
            i += 1
          }
          respond(ex, 200, mapper.writeValueAsString(out))
        case "AmazonSQS.DeleteMessage" =>
          val handle = req.path("ReceiptHandle").asText()
          if (inflight.remove(handle) == null) respond(ex, 400, """{"__type":"ReceiptHandleIsInvalid"}""")
          else { deleted.add(handle); respond(ex, 200, "{}") }
        case other => respond(ex, 400, s"""{"__type":"UnknownOperation","target":"$other"}""")
      }
    }

    /** Server-side SigV4 recomputation from the received request. */
    private def verify(ex: HttpExchange, auth: String, body: String): Boolean = {
      val sig = auth.split("Signature=").lift(1).getOrElse(return false)
      val credential = auth.split("Credential=").lift(1).map(_.split("/")).getOrElse(return false)
      val (accessKey, region, service) = (credential(0), credential(2), credential(3))
      val amzDate = ex.getRequestHeaders.getFirst("X-amz-date")
      val headers = Seq(
        "content-type" -> ex.getRequestHeaders.getFirst("Content-type"),
        "host" -> ex.getRequestHeaders.getFirst("Host"),
        "x-amz-date" -> amzDate,
        "x-amz-target" -> ex.getRequestHeaders.getFirst("X-amz-target"))
      val expected = SigV4.authorization("POST", ex.getRequestURI.getPath, "", headers,
        body, amzDate, region, service, accessKey, secretKey)
      expected.split("Signature=")(1) == sig
    }
  }

  test("SqsClient receive/delete against the protocol stub: signed requests, handles acknowledged exactly") {
    withServer { (srv, base) =>
      val stub = new SqsStub("test-secret")
      srv.createContext("/", (ex: HttpExchange) => stub.handler(ex))
      stub.enqueue("""{"s3_bucket":"b","s3_file_path":"/data/a.zip"}""")
      stub.enqueue("""{"s3_bucket":"b","s3_file_path":"/data/b.zip"}""")

      val client = new SqsClient(base, "https://sqs.local/q/inbox",
        accessKey = "AKTEST", secretKey = "test-secret")
      val got = client.receive(10)
      assert(got.map(_.body).toSet ===
        Set("""{"s3_bucket":"b","s3_file_path":"/data/a.zip"}""",
          """{"s3_bucket":"b","s3_file_path":"/data/b.zip"}"""))
      // undeleted messages are in flight, not gone
      assert(stub.inflight.size() === 2 && stub.deleted.isEmpty)
      got.foreach(m => client.delete(m.receiptHandle))
      assert(stub.inflight.isEmpty && stub.deleted.size() === 2)
      // a second delete of a consumed handle is the error SQS gives
      intercept[java.io.IOException] { client.delete(got.head.receiptHandle) }
      // a wrongly-signed client is refused (signature actually checked)
      val bad = new SqsClient(base, "https://sqs.local/q/inbox",
        accessKey = "AKTEST", secretKey = "wrong-secret")
      intercept[java.io.IOException] { bad.receive(1) }
    }
  }

  test("SqsInboxBridge: durable file per message BEFORE delete; drain empties the queue; filenames deterministic") {
    withServer { (srv, base) =>
      val stub = new SqsStub("s3cr3t")
      srv.createContext("/", (ex: HttpExchange) => stub.handler(ex))
      val bodies = (1 to 13).map(i => s"""{"s3_bucket":"b","s3_file_path":"/f$i.zip"}""")
      bodies.foreach(stub.enqueue)
      val inbox = java.nio.file.Files.createTempDirectory("sqs_inbox").toString
      val client = new SqsClient(base, "https://sqs.local/q/inbox",
        accessKey = "AK", secretKey = "s3cr3t")
      val moved = SqsInboxBridge.drainOnce(client, inbox)
      assert(moved === 13)
      val files = new java.io.File(inbox).listFiles().filter(_.getName.endsWith(".json"))
      assert(files.length === 13)
      assert(files.map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8)).toSet
        === bodies.toSet)
      // every message acknowledged, none left pending or in flight
      assert(stub.pending.isEmpty && stub.inflight.isEmpty && stub.deleted.size() === 13)
      // no temp debris
      assert(!new java.io.File(inbox).listFiles().exists(_.getName.endsWith(".tmp")))
    }
  }

  test("SigV4 is deterministic and binds the body (tamper changes the signature)") {
    val headers = Seq("content-type" -> "application/x-amz-json-1.0",
      "host" -> "sqs.us-east-1.amazonaws.com",
      "x-amz-date" -> "20240101T000000Z", "x-amz-target" -> "AmazonSQS.ReceiveMessage")
    def sign(body: String) = SigV4.authorization("POST", "/", "", headers, body,
      "20240101T000000Z", "us-east-1", "sqs", "AKIDEXAMPLE", "wJalrXUtnFEMI")
    val a = sign("""{"QueueUrl":"q"}""")
    assert(a === sign("""{"QueueUrl":"q"}"""), "signing must be deterministic")
    assert(a !== sign("""{"QueueUrl":"q2"}"""), "body must be bound by the signature")
    assert(a.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20240101/us-east-1/sqs/aws4_request, SignedHeaders="))
    assert(a.contains("SignedHeaders=content-type;host;x-amz-date;x-amz-target"))
    // cross-implementation pin: the same request signed by an INDEPENDENT
    // implementation of the published algorithm (python hashlib/hmac,
    // canonical request -> string-to-sign -> 4-step key derivation)
    // yields this signature — agreement of two implementations written
    // separately from the public spec pins the algorithm, not the code
    assert(a.endsWith("Signature=a1c06183a863365b15948fd1056e934fdb83a46bed8c34719a6a5f7ee1d41596"),
      s"SigV4 diverged from the independent reference: $a")
  }
}
