package graft.text

/** Bit-exact Scala port of the reference's deterministic mock embedder
  * (`/root/reference/src/embedders/providers.js:87-105`).
  *
  * The hash is DJB2 seeded with `5381 + i` over a 20-char window of the
  * text starting at `floor(i/dim * len)`, folded into a 32-bit int exactly
  * like JS `| 0`, mapped to `((h % 2000) - 1000) / 1000` (note JS `%`
  * keeps the sign — so does Scala), stored as float32, then
  * L2-normalized in double with float32 writeback.
  *
  * This embedder is the test oracle for all vector fixtures: identical
  * text must yield identical vectors on every JVM.
  */
object MockEmbedder {

  val DefaultDimensions = 64

  def embed(text: String, dimensions: Int = DefaultDimensions): Array[Float] = {
    val vec = new Array[Float](dimensions)
    var i = 0
    while (i < dimensions) {
      // JS: 32-bit int arithmetic via `| 0`; Scala Int wraps identically.
      var h = 5381 + i
      val start = math.floor((i.toDouble / dimensions) * text.length).toInt
      val end = math.min(start + 20, text.length)
      var j = math.min(start, text.length)
      while (j < end) {
        h = (h << 5) + h + text.charAt(j)
        j += 1
      }
      vec(i) = (((h % 2000) - 1000) / 1000.0).toFloat
      i += 1
    }
    var norm = 0.0
    i = 0
    while (i < dimensions) { norm += vec(i).toDouble * vec(i).toDouble; i += 1 }
    norm = math.sqrt(norm)
    if (norm > 0) {
      i = 0
      while (i < dimensions) { vec(i) = (vec(i).toDouble / norm).toFloat; i += 1 }
    }
    vec
  }

  /** RAGPipeline's separate mock variant (`/root/reference/src/rag/
    * RAGPipeline.js:342-360`): `hash*31` (shift-minus) over the window
    * `[i % len, min(i+10, len))`, `(h % 1000)/1000`, then L2-normalized. */
  def embedRagVariant(text: String, dimensions: Int = DefaultDimensions): Array[Float] = {
    val vec = new Array[Float](dimensions)
    val len = text.length
    var i = 0
    while (i < dimensions) {
      var h = 0
      if (len > 0) {
        val start = i % len
        val end = math.min(i + 10, len)
        var j = start
        while (j < end) {
          h = (h << 5) - h + text.charAt(j)
          j += 1
        }
      }
      vec(i) = ((h % 1000) / 1000.0).toFloat
      i += 1
    }
    normalizeInPlace(vec)
    vec
  }

  /** MCPServer's mock variant (`/root/reference/src/mcp/MCPServer.js:156-162`):
    * DJB2 seeded `5381+i` over the first 50 chars (no window), mapped to
    * `((h % 2000) - 1000)/1000`, L2-normalized. */
  def embedMcpVariant(text: String, dimensions: Int = DefaultDimensions): Array[Float] = {
    val vec = new Array[Float](dimensions)
    val end = math.min(text.length, 50)
    var i = 0
    while (i < dimensions) {
      var h = 5381 + i
      var j = 0
      while (j < end) { h = (h << 5) + h + text.charAt(j); j += 1 }
      vec(i) = (((h % 2000) - 1000) / 1000.0).toFloat
      i += 1
    }
    normalizeInPlace(vec)
    vec
  }

  private def normalizeInPlace(vec: Array[Float]): Unit = {
    var norm = 0.0
    var i = 0
    while (i < vec.length) { norm += vec(i).toDouble * vec(i).toDouble; i += 1 }
    norm = math.sqrt(norm)
    if (norm > 0) {
      i = 0
      while (i < vec.length) { vec(i) = (vec(i).toDouble / norm).toFloat; i += 1 }
    }
  }
}
