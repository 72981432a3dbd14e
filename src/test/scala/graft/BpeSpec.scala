package graft

import org.apache.spark.sql.functions._

import graft.operators.text.Bpe
import graft.sources.Snapshot

/** Merges-table byte-level BPE: analytic planted merge sequences (hand-
  * derived rank applications — ids written as "the token whose product
  * string is X", so the expectation is independent of the merge loop),
  * lossless roundtrip on adversarial strings, and the chunk/pack
  * composition parity the shard pipeline rests on.
  */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private def pid(p: String): Int = {
    val i = Bpe.Products.indexOf(p)
    assert(i >= 0, s"no merge product '$p'")
    256 + i
  }

  test("planted analytic merge sequences (hand-derived rank order)") {
    // each case hand-applied on paper against the literal table:
    //  "the"      t+h(r0) -> th+e(r14)                       => [the]
    //  " table"   l+e(r12), ' '+t(r15), ' t'+a(r29),
    //             ' ta'+b(r44), ' tab'+le(r45)               => [ table]
    //  " fastest" e+s(r8 — outranks s+t r9!), then s+t(r9,
    //             only the first occurrence survives), ' '+f(r20),
    //             ' f'+a(r40), ' fa'+st(r61)                 => [ fast, es, t]
    //  "batch"    a+t(r5); 'b','at','c','h' have none        => [b, at, c, h]
    //  " window join" as two pre-tokens                      => [ window,  join]
    val cases: Seq[(String, Seq[Int])] = Seq(
      "the" -> Seq(pid("the")),
      " table" -> Seq(pid(" table")),
      " fastest" -> Seq(pid(" fast"), pid("es"), 't'.toInt),
      "batch" -> Seq('b'.toInt, pid("at"), 'c'.toInt, 'h'.toInt),
      " window join" -> Seq(pid(" window"), pid(" join")),
      // merge-all-occurrences: rank 3 (a,n) fires on BOTH pairs in one
      // pass before any other rank is considered
      "ananas" -> Seq(pid("an"), pid("an"), 'a'.toInt, 's'.toInt))
    cases.foreach { case (text, exp) =>
      assert(Bpe.encode(text).toSeq == exp, s"encode('$text')")
      assert(Bpe.decode(exp.toArray) == text, s"decode for '$text'")
    }
  }

  test("expression path (codegen) agrees with the direct encoder and is lossless") {
    val tricky = Seq(
      "the spark table window",
      "", " ", "   ", "a  b\t\nc", // whitespace runs, tabs, newlines
      "it's 100% done, really!?", // contraction + digits + punctuation run
      "naïve café 你好", // multi-byte UTF-8 (every byte its own token)
      "0123456789 1000 42", "UPPER Case MiXeD",
      "zq-unseen-vocabulary xylophone")
    val df = tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select($"id", $"text",
        Bpe.encodeIds($"text").as("ids"),
        Bpe.decodeIds(Bpe.encodeIds($"text")).as("rt"))
    val rows = df.collect()
    rows.foreach { r =>
      val t = r.getString(1)
      assert(r.getSeq[Int](2) == Bpe.encode(t).toSeq, s"codegen != direct for '$t'")
      assert(r.getString(3) == t, s"roundtrip failed for '$t'")
    }
    // null text propagates to null ids / null roundtrip, not a crash
    val n = Seq((1L, null: String)).toDF("id", "text")
      .select(Bpe.encodeIds($"text").as("ids"), Bpe.decodeIds(Bpe.encodeIds($"text")).as("rt"))
      .collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("SQL registry parity: graft_bpe_encode/decode and graft_deflate_len") {
    val r = spark.sql(
      "SELECT graft_bpe_decode(graft_bpe_encode('the spark table')) AS rt, " +
        "size(graft_bpe_encode('the spark table')) AS n, " +
        "graft_deflate_len('the spark table') AS d").head()
    assert(r.getString(0) == "the spark table")
    assert(r.getInt(1) == 3) // [the][ spark][ table]
    assert(r.getInt(2) > 0)
  }

  test("corpus roundtrip at sf0.001 and real counts differ from the regex proxy") {
    val d = Snapshot(spark, sf()).documents.where($"text".isNotNull)
    val bad = d.where(!(Bpe.decodeIds(Bpe.encodeIds($"text")) <=> $"text")).count()
    assert(bad == 0L)
    // the BPE count is a DIFFERENT (and smaller, on this in-vocabulary
    // corpus) unit than the regex proxy in q_text_tokens — if they were
    // equal the "real tokenizer units" claim would be vacuous
    val cmp = d.agg(
      sum(Bpe.nTokens($"text")).as("bpe"),
      sum(size(split($"text", " "))).as("ws")).head()
    assert(cmp.getLong(0) > cmp.getLong(1),
      "multi-token words should make BPE counts exceed whitespace words")
    val perDoc = d.select(Bpe.nTokens($"text").as("n"), octet_length($"text").as("b"))
      .where($"n" >= $"b").count()
    assert(perDoc == 0L, "merges must fire on every corpus doc (all-English vocab)")
  }

  test("chunkIds parity: overlap-stripped concatenation reproduces the full id sequence") {
    val d = Snapshot(spark, sf()).documents.where($"text".isNotNull).limit(50)
      .localCheckpoint(true)
    val (chunkTokens, overlap) = (64, 8)
    val stride = chunkTokens - overlap
    val chunks = Bpe.chunkIds(d, "doc_id", "text", chunkTokens, overlap)
    // windows: every chunk but the last is exactly chunkTokens long and
    // starts stride past its predecessor
    val sizes = chunks.groupBy("doc_id").agg(
      max("chunk_idx").as("last_idx"),
      sum(when($"n_chunk_tokens" =!= chunkTokens, 1).otherwise(0)).as("n_short"))
    assert(sizes.where($"n_short" > 1).count() == 0, "at most the last chunk is short")
    // reassembly: chunk 0 whole, later chunks minus their overlap prefix,
    // in chunk order == the full encode
    val reassembled = chunks
      .withColumn("contrib",
        when($"chunk_idx" === 0, $"token_ids")
          .otherwise(slice($"token_ids", overlap + 1, chunkTokens)))
      .groupBy("doc_id")
      .agg(flatten(array_sort(collect_list(struct($"chunk_idx", $"contrib")))
        .getField("contrib")).as("glued"))
    val full = d.select($"doc_id", Bpe.encodeIds($"text").as("ids"))
    val mismatch = full.join(reassembled, "doc_id")
      .where(!($"ids" <=> $"glued")).count()
    assert(mismatch == 0L)
    // every chunk's id slice is in-vocab and the doc's chunk count matches
    // the ceil((n - overlap) / stride) contract
    val counts = full.select($"doc_id", size($"ids").as("n"))
      .join(chunks.groupBy("doc_id").count(), "doc_id")
      .withColumn("expect",
        greatest(lit(1L), ceil(($"n" - overlap).cast("double") / stride).cast("long")))
    assert(counts.where($"count" =!= $"expect").count() == 0L)
  }

  test("packing over real BPE counts: budgets hold in true token units") {
    import graft.operators.sample.Packing
    val d = Snapshot(spark, sf()).documents.where($"text".isNotNull)
    val budget = 2000L
    val assigned = Packing.assignShards(d, "doc_id", Bpe.nTokens($"text"), budget)
      .localCheckpoint(true)
    // the n_tokens the packer laid out ARE the real tokenizer counts
    val parity = assigned.join(
      d.select($"doc_id", Bpe.nTokens($"text").cast("long").as("real")), "doc_id")
      .where($"n_tokens" =!= $"real").count()
    assert(parity == 0L)
    // shard invariants in real units: ids contiguous from 0; every shard's
    // token total <= budget + the largest single doc (a doc can straddle)
    val maxDoc = assigned.agg(max("n_tokens")).head().getLong(0)
    val shards = assigned.groupBy("shard_id").agg(sum("n_tokens").as("tot"))
    assert(shards.where($"tot" > budget + maxDoc).count() == 0L)
    val ids = shards.select("shard_id").orderBy("shard_id").collect().map(_.getLong(0))
    assert(ids.head == 0L && ids.zipWithIndex.forall { case (v, i) => v == i.toLong })
  }
}
