package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BpeEncode, BpeTrain}

/** BPE vocabulary training: deterministic merges on the word-frequency
  * table, anchored by the independently-oracled first-merge decision. */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val merges = BpeTrain.train(spark, sf, merges = 10).collect()

  test("train produces the requested ranked merges with sane shapes") {
    assert(merges.length == 10)
    assert(merges.map(_.getInt(0)).toSeq == (1 to 10))
    merges.foreach { m =>
      val (l, r, merged, cnt) =
        (m.getString(1), m.getString(2), m.getString(3), m.getLong(4))
      assert(merged == l + r, s"merged symbol must concatenate the pair: $m")
      assert(cnt > 0)
    }
    // merge decisions are distinct pairs (re-merging an already-merged
    // pair is impossible — its occurrences were rewritten)
    val pairs = merges.map(m => (m.getString(1), m.getString(2)))
    assert(pairs.distinct.length == pairs.length)
  }

  test("the first trained merge equals the oracled standalone decision") {
    val first = BpeTrain.firstMerge(spark, sf).collect().head
    assert(merges.head.getString(1) == first.getString(0) &&
           merges.head.getString(2) == first.getString(1) &&
           merges.head.getLong(4) == first.getLong(2),
      s"train row 1 ${merges.head} vs firstMerge $first")
  }

  test("training is deterministic across runs") {
    // trainImpl, not train: the public surface memoizes per (dir, merges)
    // and would compare a frame against itself
    val again = BpeTrain.trainImpl(spark, sf, merges = 10).collect()
    assert(merges.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("merge counts reflect the rewritten corpus (non-increasing within a pair family)") {
    // a later merge can never claim a higher count than rank 1's: rank 1
    // was the global argmax on the ORIGINAL table and rewriting can only
    // split/consume pair occurrences, never create more of the same pair
    // than existed for the first decision
    assert(merges.map(_.getLong(4)).max == merges.head.getLong(4))
  }

  // ------------------------------------------------------ encode (apply)

  private def ranksOf(rows: Array[org.apache.spark.sql.Row]): Map[String, Int] =
    rows.map(m => (m.getString(1) + " " + m.getString(2)) -> m.getInt(0)).toMap

  test("encodeWord: hand cases under a known merge table") {
    // ranks: 1:(a,b)→ab  2:(ab,c)→abc  3:(d,e)→de
    val r = Map("a b" -> 1, "ab c" -> 2, "d e" -> 3)
    assert(BpeEncode.encodeWord("abc", r) == Seq("abc"))
    assert(BpeEncode.encodeWord("abcde", r) == Seq("abc", "de"))
    assert(BpeEncode.encodeWord("cab", r) == Seq("c", "ab"))
    assert(BpeEncode.encodeWord("ababc", r) == Seq("ab", "abc"))
    assert(BpeEncode.encodeWord("xyz", r) == Seq("x", "y", "z"))
    assert(BpeEncode.encodeWord("a", r) == Seq("a"))
    // all occurrences merge left-to-right in one rank pass
    assert(BpeEncode.encodeWord("aaab", Map("a a" -> 1)) == Seq("aa", "a", "b"))
  }

  test("non-BMP word: encodeWord splits code points, identically to Spark's split") {
    // '😀' is a surrogate pair (2 UTF-16 units, 1 code point): the base
    // split must yield ONE symbol per emoji — a UTF-16-unit split would
    // produce half-surrogate symbols and break the "both sides split
    // identically" fixed-point contract against training's split(word, "")
    val w = "a😀b😀"
    assert(BpeEncode.encodeWord(w, Map.empty) == Seq("a", "😀", "b", "😀"))
    // and Spark's split (training's charSymbols mechanism) agrees exactly
    import spark.implicits._
    val sparkSide = Seq(w).toDF("word")
      .select(filter(split(col("word"), ""), s => length(s) > 0).as("syms"))
      .head().getSeq[String](0)
    assert(sparkSide == Seq("a", "😀", "b", "😀"),
      s"Spark split disagrees: $sparkSide")
    // merges work across the emoji symbol like any other
    assert(BpeEncode.encodeWord("a😀", Map("a 😀" -> 1)) == Seq("a😀"))
  }

  test("greedy encode reproduces sequential-by-rank training application on the corpus") {
    // training applies merge r to every word at round r; greedy applies the
    // lowest applicable rank repeatedly — equivalent absent symbol-string
    // collisions (see BpeEncode scaladoc). Verify empirically over every
    // distinct corpus word under the full trained table.
    val trained = BpeTrain.train(spark, sf).collect()
    val ranks = ranksOf(trained)
    val ordered = trained.sortBy(_.getInt(0))
      .map(m => (m.getString(1), m.getString(2)))
    def sequential(word: String): Seq[String] = {
      var syms = word.map(_.toString).toVector
      ordered.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var p = 0
        while (p < syms.length) {
          if (p + 1 < syms.length && syms(p) == l && syms(p + 1) == r) {
            out += (l + r); p += 2
          } else { out += syms(p); p += 1 }
        }
        syms = out.toVector
      }
      syms
    }
    val words = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(BpeEncode.encodeWord(w, ranks) == sequential(w), s"word '$w'")
    }
  }

  test("encoded corpus is a fixed point: no adjacent trained pair survives") {
    val ranks = ranksOf(BpeTrain.train(spark, sf).collect())
    val encoded = BpeEncode.encodeOf(spark,
      Tables.documents(spark, sf), BpeTrain.train(spark, sf))
      .select(explode(col("word_toks")).as("toks")).collect()
    encoded.foreach { row =>
      val toks = row.getSeq[String](0)
      toks.sliding(2).foreach {
        case Seq(a, b) => assert(!ranks.contains(a + " " + b),
          s"unmerged trained pair ($a,$b) in $toks")
        case _ =>
      }
    }
  }

  test("encode bounds and roundtrip signature per document") {
    val enc = BpeEncode.encodeQuery(spark, sf)
    val bad = enc.filter(col("n_tokens") < col("n_words") ||
      col("n_tokens") > col("n_chars")).count()
    assert(bad == 0, "n_words <= n_tokens <= n_chars must hold per doc")
    // the roundtrip signature equals md5 of the normalized raw text
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(concat_ws(" ",
        graft.functions.TextFunctions.tokens(col("text")))).as("text_sig"))
    val diff = BpeEncode.roundtripQuery(spark, sf)
      .except(expected).count()
    assert(diff == 0, "encoded stream must re-assemble to the normalized text")
  }

  test("tok_sig signs token boundaries: re-segmenting without changing text changes the hash") {
    import spark.implicits._
    // same reassembled text, three segmentations: unsplit, [ab|c], [a|bc].
    // text_sig (boundary-erasing) must agree across all three; tok_sig
    // (boundary-signing, '\u0001' inner separator) must distinguish them
    val df = Seq(
      ("d1", Seq(Seq("abc"), Seq("xy"))),
      ("d2", Seq(Seq("ab", "c"), Seq("xy"))),
      ("d3", Seq(Seq("a", "bc"), Seq("x", "y")))
    ).toDF("doc_id", "word_toks")
    val got = df.select(col("doc_id"),
        BpeEncode.tokSig(col("word_toks")).as("tok"),
        md5(concat_ws(" ",
          transform(col("word_toks"), w => concat_ws("", w)))).as("txt"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got.values.map(_._2).toSet.size == 1, "text_sig must erase boundaries")
    assert(got.values.map(_._1).toSet.size == 3, "tok_sig must sign boundaries")
  }

  test("tok_sig is injective even when tokens contain the separator character") {
    import spark.implicits._
    // tokens() is a whitespace split, so a U+0001 in raw text lands INSIDE
    // a token — a bare-separator join would hash "a\u0001b" and ["a","b"]
    // identically; the length-prefixed prefix code must not. Digit/colon
    // tokens probe the prefix-code framing itself.
    val df = Seq(
      ("d1", Seq(Seq("a\u0001b"))),
      ("d2", Seq(Seq("a", "b"))),
      ("d3", Seq(Seq("1:a"))),
      ("d4", Seq(Seq("1", "a"))) // renders 1:1<SEP>1:a — must differ from 3:1:a
    ).toDF("doc_id", "word_toks")
    val sigs = df.select(BpeEncode.tokSig(col("word_toks"))).collect()
      .map(_.getString(0)).toSeq
    assert(sigs.distinct.size == sigs.size,
      s"tok_sig collided across distinct tokenizations: $sigs")
  }

  test("encode is invariant to input partitioning") {
    val docs = Tables.documents(spark, sf)
    val a = BpeEncode.encodeOf(spark, docs, BpeTrain.train(spark, sf))
      .select(col("doc_id"), to_json(col("word_toks")).as("j"))
      .collect().map(_.toString).sorted.toSeq
    val b = BpeEncode.encodeOf(spark, docs.repartition(7), BpeTrain.train(spark, sf))
      .select(col("doc_id"), to_json(col("word_toks")).as("j"))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
