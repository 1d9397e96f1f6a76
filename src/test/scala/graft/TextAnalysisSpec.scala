package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.textanalysis.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("langId picks the profile with most function-word hits; und for no hits") {
    val df = Seq(
      (1, "the table is in the room and it has a value"),
      (2, "el valor de la tabla en los datos es grande para un caso"),
      (3, "der wert und die tabelle mit den daten ist nicht klein"),
      (4, "qqqq zzzz xxxx wwww")).toDF("id", "text")
      .select($"id", TextAnalysis.langId($"text").as("lang"))
    val got = df.as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "en", 2 -> "es", 3 -> "de", 4 -> "und"))
  }

  test("quality metrics: known values on a fixed sentence") {
    val df = Seq((1, "the cat sat on the mat")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.wordCount($"text"),
      round(TextAnalysis.meanWordLen($"text"), 4),
      round(TextAnalysis.stopwordRatio($"text"), 4),
      TextAnalysis.punctRatio($"text")).head
    assert(r.getInt(0) == 6)
    assert(r.getDouble(1) == 2.8333) // 17 letters / 6 words
    assert(r.getDouble(2) == 0.5)    // the, on, the
    assert(r.getDouble(3) == 0.0)
  }

  test("token counts: bpe-ish regex splits symbols, est = ceil(chars/4)") {
    val df = Seq((1, "hello, world! x2")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.wsTokenCount($"text"),
      TextAnalysis.bpeishTokenCount($"text"),
      TextAnalysis.estTokenCount($"text")).head
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 5) // hello , world ! x2
    assert(r.getLong(2) == 4) // ceil(16/4)
  }

  test("fingerprints: normalization collapses whitespace/case; prefix md5 matches head dups") {
    val df = Seq((1, "Hello   World"), (2, "hello world"), (3, "hello world X")).toDF("id", "text")
    val (full, norm, _) = TextAnalysis.fingerprints($"text")
    val rows = df.select($"id", full.as("f"), norm.as("n")).collect()
    val byId = rows.map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byId(1)._1 != byId(2)._1) // raw differs
    assert(byId(1)._2 == byId(2)._2) // normalized equal
    assert(byId(1)._2 != byId(3)._2)
  }

  test("PII redaction: emails, IPs, phones to typed placeholders; counts match") {
    val df = Seq(
      (1, "mail alice.smith+x@corp.example.org then ip 192.168.0.12 call +1 (555) 010-9999 done"),
      (2, "no pii here just words"),
      (3, "two mails a@b.io c@d.co and 10.0.0.1")
    ).toDF("id", "text")
    val (ne, ni, np) = TextAnalysis.piiCounts($"text")
    val rows = df.select($"id", TextAnalysis.redactPii($"text").as("red"),
        ne.as("ne"), ni.as("ni"), np.as("np"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(rows(1).getAs[String]("red") ==
      "mail [EMAIL] then ip [IP] call [PHONE] done")
    assert((rows(1).getAs[Int]("ne"), rows(1).getAs[Int]("ni"), rows(1).getAs[Int]("np")) == ((1, 1, 1)))
    assert(rows(2).getAs[String]("red") == "no pii here just words")
    assert((rows(2).getAs[Int]("ne"), rows(2).getAs[Int]("ni"), rows(2).getAs[Int]("np")) == ((0, 0, 0)))
    // email redaction must precede IP (dotted domain) and phone (digit
    // runs) so neither pattern feeds on email/IP innards
    assert(rows(3).getAs[String]("red") == "two mails [EMAIL] [EMAIL] and [IP]")
    assert((rows(3).getAs[Int]("ne"), rows(3).getAs[Int]("ni"), rows(3).getAs[Int]("np")) == ((2, 1, 0)))
    // precision: ISO dates, number tables, and short digit runs are NOT
    // phones (the loose any-digit-run pattern destroyed them — r5)
    val safe = Seq((9, "released 2026-08-12 scores 10 20 30 40 50 build 555-0109 end"))
      .toDF("id", "text")
      .select(TextAnalysis.redactPii($"text")).head.getString(0)
    assert(safe == "released 2026-08-12 scores 10 20 30 40 50 build 555-0109 end")
    // NANP shapes still redact, with or without separators
    val phones = Seq((10, "call 555 010 9999 or 5550109999 now"))
      .toDF("id", "text")
      .select(TextAnalysis.redactPii($"text")).head.getString(0)
    assert(phones == "call [PHONE] or [PHONE] now")
  }

  test("unigram surprisal: hand-computed LM; rare words score high, common low") {
    val df = Seq(
      (1L, "a a b"),                    // p(a)=p(b)=... see below
      (2L, "b"),
      (3L, "a a a a rareword")          // one singleton
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(df, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // counts: a=6, b=2, rareword=1, total=9
    val (pa, pb, pr) = (6.0 / 9, 2.0 / 9, 1.0 / 9)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(1L) == ((3L, r6(-(2 * math.log(pa) + math.log(pb)) / 3))))
    assert(got(2L) == ((1L, r6(-math.log(pb)))))
    assert(got(3L) == ((5L, r6(-(4 * math.log(pa) + math.log(pr)) / 5))))
    // the doc of rarer words (all b, p=2/9) is more surprising than the
    // mostly-common doc (a a b)
    assert(got(2L)._2 > got(1L)._2)
  }

  test("bigram LM: seen bigrams use c2/c1, unseen back off with add-one unigram") {
    // train: doc 0 "a b a b c"  -> uni a=2 b=2 c=1 (N=5, V=3)
    //        bigrams: (a,b)=2 (b,a)=1 (b,c)=1
    val train = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c"),    // (a,b) seen: 2/2; (b,c) seen: 1/2
      (2L, "c a"),      // (c,a) UNSEEN: 0.4*(2+1)/(5+3)
      (3L, "a zzz"),    // (a,zzz) unseen, zzz OOV: 0.4*(0+1)/8
      (4L, "solo")      // < 2 tokens: no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(score, train, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(1L) == ((2L, r6((-math.log(2.0 / 2) - math.log(1.0 / 2)) / 2))))
    assert(got(2L) == ((1L, r6(-math.log(0.4 * 3 / 8)))))
    assert(got(3L) == ((1L, r6(-math.log(0.4 * 1 / 8)))))
    assert(!got.contains(4L))
    // an unseen transition scores worse than the corpus's common one
    assert(got(2L)._2 > got(1L)._2)
  }

  test("unigramSurprisalSplit == unigramSurprisal, topV straddling the vocab both ways") {
    // a vocab of 3 words probed with topV below, at, and above |vocab|
    // forces rows down BOTH the broadcast-hit and the shuffle-miss
    // branch (topV=1: only 'a' is top — 'b'/'rareword' instances take
    // the residual join)
    val df = Seq(
      (1L, "a a b"), (2L, "b"), (3L, "a a a a rareword")
    ).toDF("doc_id", "text")
    val base = TextAnalysis.unigramSurprisal(df, "text", "doc_id")
      .as[(Long, Long, Double)].collect().toSet
    for (topV <- Seq(1, 3, 1 << 16)) {
      val split = TextAnalysis.unigramSurprisalSplit(df, "text", "doc_id", topV)
        .as[(Long, Long, Double)].collect().toSet
      assert(split == base, s"topV=$topV must be bit-exact with the single-join plan")
    }
  }

  // r18: surprisal/dsir answer from a bounded driver-collected vocab
  // broadcast when it fits, and from the r13-r17 join plan otherwise —
  // force the fallback via the sizing knobs and pin bit-identical rows.
  private def withProp[A](key: String, v: String)(body: => A): A = {
    val old = sys.props.get(key)
    sys.props(key) = v
    try body
    finally old match {
      case Some(o) => sys.props(key) = o
      case None => sys.props -= key; ()
    }
  }

  test("unigramSurprisal fast path == join fallback; dsirWeights too") {
    val df = Seq(
      (1L, "a a b"), (2L, "b"), (3L, "a a a a rareword"),
      (4L, ""), (5L, "  ")).toDF("doc_id", "text")
    val fast = TextAnalysis.unigramSurprisal(df, "text", "doc_id")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val slow = withProp("graft.vocab.broadcastMax", "-1") {
      TextAnalysis.unigramSurprisal(df, "text", "doc_id")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    }
    assert(fast === slow)
    assert(fast.map(_._1) === Seq(1L, 2L, 3L), "empty docs emit no row on either path")

    val raw = Seq((1L, "x y x"), (2L, "y z"), (3L, "solo"),
      (4L, ""), (5L, "x y x y")).toDF("doc_id", "text")
    val target = Seq((100L, "x y"), (101L, "x")).toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select($"id", $"n_feats", $"log_w", $"keep")
        .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val dFast = rows(TextAnalysis.dsirWeights(raw, target, "text", "doc_id"))
    val dSlow = withProp("graft.span.hotBroadcastMax", "-1") {
      rows(TextAnalysis.dsirWeights(raw, target, "text", "doc_id"))
    }
    assert(dFast === dSlow)
    // featureless docs still partition the corpus on both paths
    assert(dFast.find(_._1 == 4L).exists(t => t._2 == 0L && !t._4))
  }

  test("tfidf top terms: rare terms outrank common, hand-computed scores, term tie-break") {
    val df = Seq(
      (1L, "apple apple banana common common"),
      (2L, "banana cherry common common"),
      (3L, "common common common")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(df, "text", "doc_id", k = 2)
      .as[(Long, String, Long, Double, Int)].collect()
      .map(r => (r._1, r._5) -> (r._2, r._3, r._4)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val n = 3.0
    // df: apple=1, banana=2, cherry=1, common=3
    assert(got((1L, 1)) == (("apple", 2L, r6(2 * math.log(n / 1)))))  // tf 2, rare
    assert(got((1L, 2)) == (("banana", 1L, r6(math.log(n / 2)))))
    assert(got((2L, 1)) == (("cherry", 1L, r6(math.log(n / 1)))))
    assert(got((2L, 2)) == (("banana", 1L, r6(math.log(n / 2)))))
    // doc 3 has only the zero-idf term; rank 1 with score 0
    assert(got((3L, 1)) == (("common", 3L, 0.0)))
    assert(!got.contains((3L, 2)))
  }

  test("nbClassifier: hand-computed smoothing, OOV floor, and label-order tie-break") {
    // train: x = "a a b", y = "c c d"  → V = 4, tok_c = 3 each,
    // priors 1/2 each. p(a|x) = (2+1)/(3+4) = 3/7, p(c|x) = 1/7, etc.
    val train = Seq((0L, "a a b", "x"), (1L, "c c d", "y"))
      .toDF("doc_id", "text", "label")
    // "a c" scores identically under both classes (3/7 · 1/7 each
    // way) → tie breaks to the smaller label "x". "a a" favors x;
    // "zz" is fully OOV → both classes hit the smoothed floor 1/7,
    // tie again → "x".
    val score = Seq((10L, "a c"), (11L, "a a"), (12L, "c d c"), (13L, "zz"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.nbClassifier(score, train, "text", "doc_id", "label")
      .as[(Long, String, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L)._1 == "x")
    assert(got(11L)._1 == "x")
    assert(got(12L)._1 == "y")
    assert(got(13L)._1 == "x")
    def r4(d: Double) = math.round(d * 1e4) / 1e4
    assert(got(11L)._2 == r4(math.log(0.5) + 2 * math.log(3.0 / 7)))
    assert(got(13L)._2 == r4(math.log(0.5) + math.log(1.0 / 7)))
    // "c d c" under y: p(c|y) = (2+1)/7, p(d|y) = (1+1)/7
    assert(got(12L)._2 == r4(math.log(0.5) + 2 * math.log(3.0 / 7) + math.log(2.0 / 7)))
  }

  test("gopherRepetition: dup line/para, top-gram mass, coverage fractions") {
    // doc 1: lines [a b c, a b c, x y] → dup_line 1/3, chars 13 vs 8
    //   distinct → char frac 5/13; one paragraph → para metrics 0;
    //   tokens a b c a b c x y (wchars 8): top2 mass 2×2=4 → 0.5,
    //   top3 (abc ×2) 2×3=6 → 0.75, top4 0; no repeated 5-gram → 0
    // doc 2: p..u twice (12 unit tokens): dup5/dup6 coverage = 1.0,
    //   dup10 = 0 (no repeated 10-gram), top2 mass 4 → 1/3
    val got = TextAnalysis.gopherRepetition(
        Seq((1L, "a b c\na b c\nx y"),
            (2L, "p q r s t u p q r s t u")).toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getLong(1) == 3L)                      // n_lines
    assert(r1.getDouble(2) == 1.0 / 3)               // dup_line_frac
    assert(r1.getDouble(3) == 0.0)                   // dup_para_frac
    assert(r1.getDouble(4) == 5.0 / 13)              // dup_line_char_frac
    assert(r1.getDouble(5) == 0.0)
    assert(r1.getDouble(6) == 0.5)                   // top2
    assert(r1.getDouble(7) == 0.75)                  // top3
    assert(r1.getDouble(8) == 0.0)                   // top4
    assert((9 to 14).forall(i => r1.getDouble(i) == 0.0))
    val r2 = got(2L)
    assert(r2.getDouble(6) == 1.0 / 3)               // top2
    assert(r2.getDouble(9) == 1.0)                   // dup5 coverage
    assert(r2.getDouble(10) == 1.0)                  // dup6 coverage
    assert(r2.getDouble(14) == 0.0)                  // dup10
  }

  test("c4Filters: line rules, sentence count, page flags, clean md5") {
    // doc 1: 6 lines — soup (no punct), fox (keep), javascript (drop),
    // 2-word (drop), '!' line (keep), '?' line (keep) → 3 sentences, keeps
    val d1 = "no punct soup line" +
      "\nthe quick brown fox jumps over the lazy dog." +
      "\nclick here javascript now." +
      "\nshort one." +
      "\nreal sentence number two here it is!" +
      "\nanother real sentence is right here ok?"
    val d1clean = "the quick brown fox jumps over the lazy dog." +
      "\nreal sentence number two here it is!" +
      "\nanother real sentence is right here ok?"
    // doc 2: both lines survive the LINE rules but the PAGE flags fire
    val d2 = "lorem ipsum makes this page fail.\nthis has { braces } in it ok."
    // doc 3: bad word token, and only 1 sentence
    val d3 = "verboten appears here in this doc."
    val got = TextAnalysis.c4Filters(
        Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val r1 = got(1L)
    assert(r1.getLong(1) == 6L && r1.getLong(2) == 3L) // n_lines, n_kept
    assert(r1.getLong(3) == 3L)                        // n_sentences
    assert(!r1.getBoolean(4) && !r1.getBoolean(5) && !r1.getBoolean(6))
    assert(r1.getString(7) == md5hex(d1clean))
    assert(r1.getBoolean(8))                           // keep
    val r2 = got(2L)
    assert(r2.getLong(2) == 2L && r2.getLong(3) == 2L)
    assert(r2.getBoolean(4) && r2.getBoolean(5) && !r2.getBoolean(6))
    assert(!r2.getBoolean(8))
    val r3 = got(3L)
    assert(r3.getLong(2) == 1L && r3.getBoolean(6) && !r3.getBoolean(8))
  }

  test("gopherRules: hand-computed metrics per rule; composite pass") {
    // doc 1: 3 lines, 13 tokens [the be to of and that have with • x... - y z]
    //   word lens 3+2+2+2+3+4+4+4+1+4+1+1+1 = 32; one '...'; 2 bullet
    //   lines; 1 ellipsis line; 11/13 alphabetic; all 8 stops present
    // doc 2: 60 words (58×"word" + the + and), single line, clean — passes
    val docs = Seq(
      (1L, "the be to of and that have with\n• x...\n- y z"),
      (2L, (Seq.fill(58)("word") ++ Seq("the", "and")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = got(1L)
    assert(d1.getLong(1) == 13L)                    // n_words
    assert(d1.getDouble(2) == 2.461538)             // mean_word_len 32/13
    assert(d1.getDouble(3) == 0.076923)             // symbol_ratio 1/13
    assert(d1.getDouble(4) == 0.666667)             // bullet 2/3
    assert(d1.getDouble(5) == 0.333333)             // ellipsis 1/3
    assert(d1.getDouble(6) == 0.846154)             // alpha 11/13
    assert(d1.getLong(7) == 8L)                     // all stops
    assert(!d1.getBoolean(8))                       // <50 words -> fail
    val d2 = got(2L)
    assert(d2.getLong(1) == 60L)
    assert(d2.getDouble(2) == 3.966667)             // (58*4+3+3)/60
    assert(d2.getLong(7) == 2L)
    assert(d2.getBoolean(8))                        // every rule green
  }

  test("dsirWeights: hand-computed log-ratios, joint-vocab smoothing, p75 keep") {
    // raw = 4 docs, target = the two lang='en' docs. Gram instances
    // (uni + bi): doc1/doc4 "a b" → {a, b, a␟b}; doc2 "a a" →
    // {a, a, a␟a}; doc3 "c c" → {c, c, c␟c}.
    // target counts: a:3 b:1 a␟b:1 a␟a:1 (N_p=6); raw counts: a:4 b:2
    // a␟b:2 a␟a:1 c:2 c␟c:1 (N_q=12); joint V=6 → per-gram ratio
    // ln((cp+1)/12) − ln((cq+1)/18).
    val raw = Seq((1L, "a b", "en"), (2L, "a a", "en"),
      (3L, "c c", "zh"), (4L, "a b", "zh")).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.dsirWeights(
        raw, raw.filter($"lang" === "en"), "text", "doc_id")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def r4(d: Double) = math.round(d * 1e4) / 1e4
    val lnA = math.log(4.0 / 12) - math.log(5.0 / 18)   // ln 1.2
    val lnAA = math.log(2.0 / 12) - math.log(2.0 / 18)  // ln 1.5
    val lnC = math.log(1.0 / 12) - math.log(3.0 / 18)   // ln 0.5
    val lnCC = math.log(1.0 / 12) - math.log(2.0 / 18)  // ln 0.75
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_._1 == 3L)) // 2 uni + 1 bi each
    assert(got(1L)._2 == r4(lnA)) // b and a␟b ratios are exactly 0
    assert(got(2L)._2 == r4(2 * lnA + lnAA))
    assert(got(3L)._2 == r4(2 * lnC + lnCC))
    assert(got(4L)._2 == got(1L)._2)
    // p75 of [-1.674, 0.1823, 0.1823, 0.7701] interpolates strictly
    // between the tied middle and the top → only doc2 keeps
    assert(got.view.mapValues(_._3).toMap ==
      Map(1L -> false, 2L -> true, 3L -> false, 4L -> false))
  }

  test("dsirWeights: null/empty-text docs survive as n_feats=0 keep=false rows") {
    // ADVICE r13: a null text column used to NPE the whole job, and
    // featureless docs vanished from the output — the op must
    // PARTITION the corpus (one row per input doc), never lose rows
    val raw = Seq((1L, "a b", "en"), (2L, null.asInstanceOf[String], "zh"),
      (3L, "   ", "zh"), (4L, "a a", "en")).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.dsirWeights(
        raw, raw.filter($"lang" === "en"), "text", "doc_id")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(2L) == ((0L, 0.0, false)))
    assert(got(3L) == ((0L, 0.0, false)))
    assert(got(1L)._1 == 3L && got(4L)._1 == 3L) // featured docs unchanged
  }

  test("gopherRepetition: char masses count code points, not UTF-16 units") {
    // ADVICE r13: supplementary-plane text (emoji = 2 UTF-16 units,
    // 1 code point) must produce the same fractions DuckDB len() gives.
    // doc 1 lines [😀, 😀, xy]: dup chars (4-3)/4 = 0.25 in code
    // points (UTF-16 would read 2/6 = 0.333…).
    // doc 2 tokens [😀, 😀, 😀, ab]: top-2-gram mass 2×2/5 = 0.8 in
    // code points (UTF-16: 2×4/8 = 1.0).
    val got = TextAnalysis.gopherRepetition(
        Seq((1L, "😀\n😀\nxy"),
            (2L, "😀 😀 😀 ab"))
          .toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getDouble(2) == 1.0 / 3)  // dup_line_frac (count-based)
    assert(got(1L).getDouble(4) == 0.25)     // dup_line_char_frac
    assert(got(2L).getDouble(6) == 0.8)      // top_2gram_char_frac
  }

  test("ccnetBuckets: per-language terciles, row preservation, featureless tail") {
    val docs = Seq(
      (1L, "a a a", "x"), (2L, "a b", "x"), (3L, "b c", "x"), (4L, "c c c c", "x"),
      (5L, "z z", "y"), (6L, "z q", "y"), (7L, "q q q", "y"),
      (8L, null.asInstanceOf[String], "y"), (9L, "   ", "x"),
      // null lang: its own '' language (the equi-joins must not
      // null-drop a scored doc) — one featured doc, so its tercile
      // thresholds equal its own score and it buckets head/keep
      (10L, "a b c", null.asInstanceOf[String]))
    // reference: corpus-wide unigram LM, 6dp-rounded mean NLL,
    // per-language interpolated terciles, featureless docs -> tail
    val toks = docs.map { case (id, t, _) =>
      id -> Option(t).getOrElse("").toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val counts = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val total = counts.values.sum.toDouble
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val score = toks.collect { case (id, ws) if ws.nonEmpty =>
      id -> r6(ws.map(w => -math.log(counts(w) / total)).sum / ws.length) }
    def pct(v: Seq[Double], p: Double): Double = {
      val s = v.sorted; val rank = (s.length - 1) * p
      val lo = s(rank.toInt); val hi = s(math.min(rank.toInt + 1, s.length - 1))
      lo + (rank - rank.toInt) * (hi - lo)
    }
    val langOf = docs.map(d => d._1 -> Option(d._3).getOrElse("")).toMap
    val thr = langOf.values.toSeq.distinct.map { l =>
      val vs = score.collect { case (id, s) if langOf(id) == l => s }.toSeq
      l -> ((pct(vs, 0.33), pct(vs, 0.67)))
    }.toMap
    val expected = docs.map { case (id, _, _) =>
      val l = langOf(id)
      score.get(id) match {
        case None => (id, l, 0L, 0.0, "tail", false)
        case Some(s) =>
          val (t1, t2) = thr(l)
          val b = if (s <= t1) "head" else if (s <= t2) "middle" else "tail"
          (id, l, toks(id).size.toLong, s, b, b != "tail")
      }
    }.sortBy(_._1)
    val got = TextAnalysis.ccnetBuckets(
        docs.toDF("doc_id", "text", "lang"), "text", "doc_id", "lang")
      .as[(Long, String, Long, Double, String, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got == expected)
    // the per-language property the op exists for: each language's own
    // tercile split, so every lang with >= 3 featured docs has a head
    Seq("x", "y").foreach { l =>
      assert(got.exists(r => r._2 == l && r._5 == "head"), s"lang $l has no head")
      assert(got.exists(r => r._2 == l && r._5 == "tail"), s"lang $l has no tail")
    }
  }

  test("ccnetBuckets: weighted-histogram terciles match the expanded-rows percentile under heavy score ties") {
    // VERDICT r14 #3 pin: thresholds now come from per-language
    // (surprisal, count) pairs via percentile(s, p, cnt). With heavy
    // ties the cumulative-count interpolation is where a weighted
    // implementation could diverge from the naive expanded-rows form —
    // this corpus makes most docs share one of two scores, so the
    // tercile ranks land INSIDE tied runs.
    val docs =
      (1L to 40L).map(i => (i, "a a a", "en")) ++    // 40 identical scores
      (41L to 70L).map(i => (i, "a b", "en")) ++     // 30 identical scores
      (71L to 75L).map(i => (i, "b c d", "en"))      // 5 rarer-word docs
    val got = TextAnalysis.ccnetBuckets(
        docs.toDF("doc_id", "text", "lang"), "text", "doc_id", "lang")
      .as[(Long, String, Long, Double, String, Boolean)]
      .collect().sortBy(_._1)
    // expanded-rows reference: same LM scoring, naive percentile
    val toks = docs.map { case (id, t, _) =>
      id -> t.split("\\s+").toSeq }.toMap
    val counts = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val total = counts.values.sum.toDouble
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val score = toks.view.mapValues(ws =>
      r6(ws.map(w => -math.log(counts(w) / total)).sum / ws.length)).toMap
    def pct(v: Seq[Double], p: Double): Double = {
      val s = v.sorted; val rank = (s.length - 1) * p
      val lo = s(rank.toInt); val hi = s(math.min(rank.toInt + 1, s.length - 1))
      lo + (rank - rank.toInt) * (hi - lo)
    }
    val all = docs.map(d => score(d._1))
    val (t1, t2) = (pct(all, 0.33), pct(all, 0.67))
    docs.foreach { case (id, _, _) =>
      val s = score(id)
      val b = if (s <= t1) "head" else if (s <= t2) "middle" else "tail"
      val row = got(id.toInt - 1)
      assert(row._4 == s && row._5 == b, s"doc $id: got $row want ($s, $b)")
    }
  }

  test("winnowing: identical text -> identical fingerprints; shared run -> shared hashes") {
    val a = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog")
    val b = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog")
    val c = TextAnalysis.winnow("XX the quick brown fox jumps over the lazy dog YY")
    val d = TextAnalysis.winnow("completely unrelated text with different characters")
    assert(a == b && a.nonEmpty)
    assert(a.toSet.intersect(c.toSet).size > a.size / 2) // shared run survives offset
    assert(a.toSet.intersect(d.toSet).isEmpty)
    assert(TextAnalysis.winnow("short", k = 8).isEmpty)
  }
}
