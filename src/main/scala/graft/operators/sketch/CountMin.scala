package graft.operators.sketch

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** The sketch result: `depth × width` cell counts (row-major) plus the
  * absorbed stream size. Estimates are one-sided: `estimate(t) ≥ true
  * count of t` ALWAYS (every occurrence lands in all `depth` cells);
  * the overestimate is the colliding mass of the least-loaded row —
  * probabilistically ≤ e/width · n per the classic analysis, and
  * DETERMINISTIC given fixed data and hash seeds (what makes the
  * verdict-style oracle reproducible, the MG/HLL pattern).
  */
final case class CMSketch(depth: Int, width: Int, n: Long, cells: Seq[Long]) {

  def estimate(term: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = cells(r * width + CountMin.cellIndex(term, r, width))
      if (c < best) best = c
      r += 1
    }
    if (best == Long.MaxValue) 0L else best
  }

  /** Cell-wise sum — the associative, commutative merge (same geometry
    * required). NOT idempotent: the D20 partition contract.
    */
  def merged(other: CMSketch): CMSketch = {
    require(depth == other.depth && width == other.width,
      s"geometry mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    val out = new Array[Long](cells.length)
    var i = 0
    while (i < out.length) { out(i) = cells(i) + other.cells(i); i += 1 }
    CMSketch(depth, width, n + other.n, out.toSeq)
  }
}

/** Count–Min frequency sketch as a typed `Aggregator` (Cormode &
  * Muthukrishnan 2005) — the POINT-QUERY member of the sketch family
  * (HLL answers distinct counts, Misra–Gries surfaces the heavy-hitter
  * SET, Count–Min answers "how often did THIS term occur?" for any
  * term, in `depth × width` longs however large the vocabulary). Cells
  * merge by plain addition — associative and commutative, so partial
  * aggregation, AQE re-plans and streaming microbatches (D30) all
  * produce the IDENTICAL sketch: the estimate for every term is
  * bit-reproducible across partitionings, unlike MG's order-sensitive
  * counter set.
  *
  * Hashing: row r uses MurmurHash3 (scala.util.hashing — a pinned,
  * JVM-stable algorithm) over the term's UTF-8 BYTES with seed
  * `Seed + r`, floorMod to the width. Byte-level (the UTF8String wire
  * form), so driver/executor and cross-JVM agree.
  *
  * Buffer is a primitive long array (kryo — the MG trade); the per-row
  * path is `depth` hash-probe increments, no allocation.
  */
final class CountMin(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], CMSketch] {
  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 2, s"width must be >= 2, got $width")

  override def zero: Array[Long] = new Array[Long](depth * width + 1)

  override def reduce(buf: Array[Long], term: String): Array[Long] = {
    if (term == null) return buf
    // UTF-8 conversion ONCE per row — only the depth MurmurHash3 probes
    // repeat (ADVICE r13: the per-depth fromString re-ran the
    // allocation+copy depth times in the hot per-row path)
    val bytes = UTF8String.fromString(term).getBytes
    var r = 0
    while (r < depth) {
      buf(r * width + CountMin.cellIndex(bytes, r, width)) += 1
      r += 1
    }
    buf(depth * width) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): CMSketch =
    CMSketch(depth, width, buf(depth * width), buf.take(depth * width).toSeq)

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[CMSketch] = Encoders.product[CMSketch]
}

object CountMin {
  private val Seed = 0x5ca1ab1e

  /** Row-r cell index of a term: MurmurHash3 over UTF-8 bytes, seed
    * varies by row, floorMod to the width.
    */
  def cellIndex(term: String, row: Int, width: Int): Int =
    cellIndex(UTF8String.fromString(term).getBytes, row, width)

  /** Byte-form overload — the hot aggregation path converts the term
    * to UTF-8 once and probes all `depth` rows from the same bytes.
    */
  def cellIndex(bytes: Array[Byte], row: Int, width: Int): Int =
    java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed + row), width)
}
