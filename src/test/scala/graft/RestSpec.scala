package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.api.RestServer

/** End-to-end HTTP lifecycle — the Spark analog of the reference REST app's
  * GraphIntegrationTest (kafka-graphs-rest-app .../GraphIntegrationTest.java):
  * import → prepare → configure → run → poll state → stream result. */
class RestSpec extends SparkSpec {

  private lazy val client = HttpClient.newHttpClient()

  private def post(url: String, body: String = ""): String =
    client.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()).body()

  private def get(url: String): String =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()

  private def field(json: String, key: String): String = {
    val m = ("\"" + key + "\":\"?([^\",}]+)\"?").r.findFirstMatchIn(json)
    assert(m.isDefined, s"no $key in $json")
    m.get.group(1)
  }

  test("import → prepare → configure → run → state → SSE result over HTTP") {
    val srv = new RestServer(spark).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      // two-chains fixture: components {0..9} and {10..20}
      val edges = ((0 until 9).map(i => s"$i ${i + 1} 1.0") ++
        (10 until 20).map(i => s"$i ${i + 1} 1.0")).mkString("\n")

      val imp = post(s"$base/import?name=g&type=edges", edges)
      assert(field(imp, "edges") === "19")
      val prep = post(s"$base/prepare?name=g&partitions=4")
      assert(field(prep, "partitions") === "4")

      val conf = post(s"$base/pregel",
        """{"algorithm":"wcc","graph":"g","configs":{}}""")
      val id = field(conf, "id")
      assert(field(conf, "state") === "CREATED")

      assert(field(post(s"$base/pregel/$id", """{"numIterations":30}"""),
        "state") === "RUNNING")
      // poll until terminal, like the reference client
      var st = ""
      val deadline = System.currentTimeMillis() + 120000
      while (st != "COMPLETED" && st != "HALTED" && st != "ERROR" &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        st = field(get(s"$base/pregel/$id"), "state")
      }
      assert(st === "COMPLETED" || st === "HALTED", get(s"$base/pregel/$id"))
      assert(field(get(s"$base/pregel/$id"), "superstep").toInt > 0)

      val sse = get(s"$base/pregel/$id/result")
      val rows = sse.split("\n\n").filter(_.startsWith("data: "))
        .map(_.stripPrefix("data: "))
        .map(j => field(j, "key").toLong -> field(j, "value").toLong).toMap
      assert(rows.size === 21)
      assert((0L to 9L).forall(rows(_) === 0L))
      assert((10L to 20L).forall(rows(_) === 10L))

      // unknown algorithm rejected; submission deletable
      assert(post(s"$base/pregel",
        """{"algorithm":"nope","graph":"g"}""").contains("error"))
      assert(get(s"$base/pregel/$id").contains("COMPLETED") ||
        get(s"$base/pregel/$id").contains("HALTED"))
      client.send(HttpRequest.newBuilder(URI.create(s"$base/pregel/$id"))
        .DELETE().build(), HttpResponse.BodyHandlers.ofString())
      assert(get(s"$base/pregel/$id").contains("error"))
    } finally srv.stop()
  }

  test("sssp with srcVertexId config over HTTP") {
    val srv = new RestServer(spark).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      post(s"$base/import?name=c&type=edges",
        (0 until 5).map(i => s"$i ${i + 1} 2.0").mkString("\n"))
      val id = field(post(s"$base/pregel",
        """{"algorithm":"sssp","graph":"c","configs":{"srcVertexId":0}}"""), "id")
      post(s"$base/pregel/$id", "{}")
      var st = ""
      val deadline = System.currentTimeMillis() + 120000
      while (st != "COMPLETED" && st != "HALTED" && st != "ERROR" &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        st = field(get(s"$base/pregel/$id"), "state")
      }
      val sse = get(s"$base/pregel/$id/result")
      val rows = sse.split("\n\n").filter(_.startsWith("data: "))
        .map(_.stripPrefix("data: "))
        .map(j => field(j, "key").toLong -> field(j, "value").toDouble).toMap
      assert(rows === (0 to 5).map(i => i.toLong -> i * 2.0).toMap)
    } finally srv.stop()
  }

  test("svdpp train + predict verb over HTTP (SvdppPredictor parity)") {
    val srv = new RestServer(spark).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      // bipartite ratings: "user item rating" lines (items get −id−1 keys)
      post(s"$base/import?name=r&type=edges",
        Seq("1 1 1.0", "1 2 2.0", "2 1 2.0", "2 2 4.0", "3 1 3.0", "3 2 5.0")
          .mkString("\n"))
      val id = field(post(s"$base/pregel",
        """{"algorithm":"svdpp","graph":"r",
          |"configs":{"iterations":4,"random.seed":42}}""".stripMargin), "id")
      post(s"$base/pregel/$id", """{"numIterations":12}""")
      var st = ""
      val deadline = System.currentTimeMillis() + 120000
      while (st != "COMPLETED" && st != "HALTED" && st != "ERROR" &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        st = field(get(s"$base/pregel/$id"), "state")
      }
      assert(st === "COMPLETED" || st === "HALTED", get(s"$base/pregel/$id"))
      // state carries the final aggregates the reference tool reads
      val stateJson = get(s"$base/pregel/$id")
      assert(stateJson.contains("edge.count.aggregator"))
      assert(stateJson.contains("svd.overall.rating.aggregator"))

      val p = get(s"$base/pregel/$id/predict?user=1&item=2")
      val predicted = field(p, "predicted").toFloat
      assert(predicted >= 0.0f && predicted <= 5.0f, p)
      // deterministic: same factors → same prediction
      assert(field(get(s"$base/pregel/$id/predict?user=1&item=2"), "predicted")
        .toFloat === predicted)
      // unknown user/item rejected
      assert(get(s"$base/pregel/$id/predict?user=99&item=2").contains("error"))
      // configs verb serves the submission's configs (predictor reads
      // min/max.rating from here)
      val cfg = get(s"$base/pregel/$id/configs")
      assert(field(cfg, "iterations").toInt === 4)
      assert(field(cfg, "random.seed").toLong === 42L)
    } finally srv.stop()
  }
}
