package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: where does REST /api/search latency go?
  * Layers: engine.serving() lookup, handle.search kernel, facade.call,
  * HTTP round-trip. (This probe isolated the ~40 ms JDK-HttpServer
  * Nagle stall fixed in RestServer.) */
object RestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val root = java.nio.file.Files.createTempDirectory("graft_restprobe").toString
    val g = graft.Graft.create(spark, root)
    g.engine.createCollection("bench", graft.model.CollectionConfig(dimensions = 64))
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n = e.count()
    val copies = math.max(1, (100000 / math.max(1L, n)).toInt)
    val tiled = e.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .select(concat(lit("v"), (col("vec_id") + col("copy") * n)).as("id"),
        col("embedding").cast("array<float>").as("vector"),
        concat(lit("doc "), col("vec_id")).as("content"))
    g.engine.insert("bench", tiled.repartition(8))

    def p50(label: String, reps: Int)(body: => Unit): Unit = {
      val (p, best) = Timing.p50BestMs(reps)(body)
      println(f"[probe] $label%-28s p50=$p%.3f ms  best=$best%.3f ms")
    }

    val qv = g.embedder.embed("finding relevant documents").map(_.toDouble).toSeq
    val h = g.engine.serving("bench").get
    p50("serving() lookup", 200)(g.engine.serving("bench").get: Unit)
    p50("handle.search", 200)(h.search(qv, 10): Unit)
    val facade = new graft.server.EngineFacade(g.engine, g.embedder, g.memory, g.rag, g.tree)
    val body = """{"collection":"bench","query":"finding relevant documents","topK":10}"""
    p50("facade.call(search)", 200)(facade.call("search", body): Unit)
    val rest = g.restServer(0)
    val port = rest.start()
    // finally: HttpServer dispatcher is non-daemon — JVM hangs otherwise
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(): String = {
        val req = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"http://127.0.0.1:$port/api/search"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build()
        client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      }
      p50("http rt (java.net.http)", 200)(post(): Unit)
      val ka = new KeepAliveHttp("127.0.0.1", port)
      try p50("http rt (keep-alive sock)", 200)(ka.post("/api/search", body): Unit)
      finally ka.close()
    } finally rest.stop()
    spark.stop()
  }
}
