package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

/** Minimal Amazon SQS client speaking the public AWS JSON 1.0 protocol
  * (POST + `X-Amz-Target: AmazonSQS.<Action>`) with AWS Signature
  * Version 4 request signing — the receive/delete loop the reference's
  * sensor runs through boto3 (/root/reference/sqs_sensor_dag.py:127-133
  * [inferred]: receive up to 10 messages, process, delete by receipt
  * handle).
  *
  * This container has zero egress, so the contract specs drive the
  * client against a local HTTP stub speaking the same protocol; against
  * real SQS only the endpoint/credentials change. No AWS SDK exists on
  * the classpath — the protocol and SigV4 are implemented from the
  * public AWS documentation (JSON bodies via Jackson, which Spark
  * already ships).
  *
  * Semantics preserved from the reference loop:
  *  - receive is at-least-once: a message not deleted before its
  *    visibility timeout reappears;
  *  - delete-by-receipt-handle acknowledges EXACTLY the received
  *    instance;
  *  - the caller decides when a message is safely processed (see
  *    [[SqsInboxBridge]]: delete only after the durable write).
  */
final class SqsClient(
    endpoint: String,
    queueUrl: String,
    region: String = "us-east-1",
    accessKey: String = "",
    secretKey: String = "",
    timeout: java.time.Duration = java.time.Duration.ofSeconds(30),
    // seam for the specs' fixed signing timestamp; production uses now()
    clock: () => java.time.Instant = () => java.time.Instant.now(),
) {

  final case class Message(messageId: String, receiptHandle: String, body: String)

  @transient private lazy val http: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m
  }

  /** Receive up to `max` messages (long-poll `waitSeconds`). */
  def receive(max: Int = 10, waitSeconds: Int = 0): Seq[Message] = {
    require(max >= 1 && max <= 10, s"SQS allows 1..10 messages per receive: $max")
    val body = mapper.createObjectNode()
    body.put("QueueUrl", queueUrl)
    body.put("MaxNumberOfMessages", max)
    body.put("WaitTimeSeconds", waitSeconds)
    val resp = call("ReceiveMessage", mapper.writeValueAsString(body))
    val msgs = mapper.readTree(resp).path("Messages")
    (0 until msgs.size()).map { i =>
      val m = msgs.get(i)
      Message(m.path("MessageId").asText(), m.path("ReceiptHandle").asText(), m.path("Body").asText())
    }
  }

  /** Acknowledge one received message instance. */
  def delete(receiptHandle: String): Unit = {
    val body = mapper.createObjectNode()
    body.put("QueueUrl", queueUrl)
    body.put("ReceiptHandle", receiptHandle)
    call("DeleteMessage", mapper.writeValueAsString(body)): Unit
  }

  private def call(action: String, body: String): String = {
    val uri = java.net.URI.create(endpoint)
    val amzDate = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC).format(clock())
    val headers = scala.collection.mutable.LinkedHashMap(
      "content-type" -> "application/x-amz-json-1.0",
      "host" -> (uri.getHost + (if (uri.getPort > 0) s":${uri.getPort}" else "")),
      "x-amz-date" -> amzDate,
      "x-amz-target" -> s"AmazonSQS.$action",
    )
    val auth = SigV4.authorization(
      method = "POST", path = Option(uri.getPath).filter(_.nonEmpty).getOrElse("/"),
      query = "", headers = headers.toSeq, body = body,
      amzDate = amzDate, region = region, service = "sqs",
      accessKey = accessKey, secretKey = secretKey)
    val reqB = java.net.http.HttpRequest.newBuilder(uri).timeout(timeout)
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body, UTF_8))
    headers.filter(_._1 != "host").foreach { case (k, v) => reqB.header(k, v) }
    reqB.header("Authorization", auth)
    val resp = http.send(reqB.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"SQS $action failed: HTTP ${resp.statusCode()} ${resp.body()}")
    resp.body()
  }
}

/** AWS Signature Version 4 (public spec:
  * docs.aws.amazon.com/IAM/latest/UserGuide/create-signed-request.html).
  * Deterministic given (request, date, keys) — pinned by SigV4Spec
  * against a hand-derivable vector.
  */
object SigV4 {
  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }
  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def sha256(s: String): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes(UTF_8)))

  def authorization(
      method: String, path: String, query: String, headers: Seq[(String, String)],
      body: String, amzDate: String, region: String, service: String,
      accessKey: String, secretKey: String): String = {
    val date = amzDate.take(8)
    val sorted = headers.map { case (k, v) => (k.toLowerCase, v.trim) }.sortBy(_._1)
    val canonicalHeaders = sorted.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = sorted.map(_._1).mkString(";")
    val canonicalRequest =
      s"$method\n$path\n$query\n$canonicalHeaders\n$signedHeaders\n${sha256(body)}"
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n${sha256(canonicalRequest)}"
    val kDate = hmac(s"AWS4$secretKey".getBytes(UTF_8), date)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    val kSigning = hmac(kService, "aws4_request")
    val signature = hex(hmac(kSigning, stringToSign))
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, SignedHeaders=$signedHeaders, Signature=$signature"
  }
}

/** Bridge from an SQS queue to the [[SensorLoop]] file-drop inbox: one
  * drain pass receives messages, writes each body as a durable .json
  * file in `inboxDir` (tmp-write + atomic rename, so the streaming
  * source never reads a partial file), and deletes the message ONLY
  * after its file is durably in place — a crash between write and
  * delete redelivers the message, and the deterministic filename
  * (message id) makes the rewrite idempotent. At-least-once end to
  * end, exactly-once in effect.
  *
  * This keeps the production topology identical to the spec'd one: the
  * streaming source, batch semantics, retries, and fan-out all live in
  * [[SensorLoop]]; SQS is just the transport feeding its inbox, the
  * same way the reference's sensor feeds TriggerMultiDagRun.
  */
object SqsInboxBridge {
  /** Drain until a receive returns empty; returns messages moved. */
  def drainOnce(client: SqsClient, inboxDir: String, maxPerReceive: Int = 10): Int = {
    val dir = new java.io.File(inboxDir)
    dir.mkdirs()
    var moved = 0
    var batch = client.receive(maxPerReceive)
    while (batch.nonEmpty) {
      batch.foreach { m =>
        val tmp = new java.io.File(dir, s".${m.messageId}.json.tmp")
        val dst = new java.io.File(dir, s"${m.messageId}.json")
        java.nio.file.Files.write(tmp.toPath, m.body.getBytes(UTF_8))
        java.nio.file.Files.move(tmp.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        client.delete(m.receiptHandle)
        moved += 1
      }
      batch = client.receive(maxPerReceive)
    }
    moved
  }
}
