package graft.operators

import graft.SparkSpec

/** Gopher-style repetition signals: hand-computed fractions,
  * deterministic tie-breaks, degenerate documents. */
class RepetitionSpec extends SparkSpec {

  test("dupLineSignals: hand-computed fractions") {
    import spark.implicits._
    val df = Seq(
      (1L, "a\nb\na\nc"), // a duplicated: 2 of 4 lines, 2 of 4 chars
      (2L, "xx\nyy"), // no duplicates
      (3L, "")) // one empty line; zero chars → guarded 0.0
      .toDF("doc_id", "text")
    val got = TextOps.dupLineSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 0.5, 0.5)))
    assert(got(2L) === ((2L, 0.0, 0.0)))
    assert(got(3L) === ((1L, 0.0, 0.0)))
  }

  test("topNgramSignal: top bigram coverage, ties, short docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b c"), // "a b" x2, covers 2*2 of 5 word chars
      (2L, "x y z"), // tie between "x y" and "y z" → min gram, 2/3
      (3L, "solo")) // < 2 tokens → 0.0
      .toDF("doc_id", "text")
    val got = TextOps.topNgramSignal(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.8)
    assert(got(2L) === 2.0 / 3.0)
    assert(got(3L) === 0.0)
    graft.engine.Caches.drain(spark)
  }

  test("topNgramSignal: whitespace-only doc scores 0.0, not NaN") {
    import spark.implicits._
    // "\n\n" survives the space-only trim and splits into two EMPTY
    // tokens — zero word chars; the wc > 0 guard must keep the
    // fraction defined
    val df = Seq((1L, "\n\n"), (2L, "a b a b")).toDF("doc_id", "text")
    val got = TextOps.topNgramSignal(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.0)
    assert(got(2L) === 1.0)
    graft.engine.Caches.drain(spark)
  }

  test("topNgramSignals computes several n over one cached base") {
    import spark.implicits._
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val row = TextOps.topNgramSignals(df, "doc_id", "text", Seq(2, 3))
      .collect().head
    assert(row.getDouble(row.fieldIndex("top2_char_frac")) === 0.8)
    // 3-grams of [a,b,a,b,c]: "a b a","b a b","a b c" all count 1 →
    // tie → "a b a", 1*3/5
    assert(row.getDouble(row.fieldIndex("top3_char_frac")) === 0.6)
    graft.engine.Caches.drain(spark)
  }

  test("single-n topNgramSignal registers NO session cache; multi-n one") {
    import spark.implicits._
    graft.engine.Caches.drain(spark)
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    // single n: no persist — a caller that never drains must not hold
    // a corpus-sized frame until the MaxPending bound evicts it
    TextOps.topNgramSignal(df, "doc_id", "text", 2).collect()
    assert(graft.engine.Caches.pending(spark) === 0)
    // several n: the shared tokenized base IS cached (and registered)
    TextOps.topNgramSignals(df, "doc_id", "text", Seq(2, 3)).collect()
    assert(graft.engine.Caches.pending(spark) === 1)
    graft.engine.Caches.drain(spark)
    assert(graft.engine.Caches.pending(spark) === 0)
  }

  test("topNgramSignal n=3 and fixture discriminates") {
    import spark.implicits._
    val df = Seq((1L, "p q p q p q")).toDF("doc_id", "text")
    // 3-grams: "p q p" x2, "q p q" x2 → tie → "p q p", 2*3/6 = 1.0
    val got3 = TextOps.topNgramSignal(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got3(1L) === 1.0)
    // the driver fixture really exercises both regimes
    val fx = graft.engine.DataQueries.repetitionDocs(spark)
    val sig = TextOps.dupLineSignals(fx, "doc_id", "text")
    val fracs = sig.select("dup_line_frac").collect().map(_.getDouble(0))
    assert(fracs.exists(_ > 0.5) && fracs.contains(0.0))
  }
}
