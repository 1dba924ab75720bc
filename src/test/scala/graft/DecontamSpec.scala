package graft

import graft.functions.{BloomAgg, BloomAggregator}
import graft.ops.{Decontaminate, Repetition}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the decontamination family (driver-gated q68/q69/q70):
  * the Bloom membership sketch (no false negatives EVER, bounded false
  * positives, OR-merge associativity), the decontamination pipeline
  * (bloom prefilter + exact refine == full exact join, on planted and
  * random corpora, with the broadcast plan shape), and the repetition
  * stats (row-local run-length fold == definitional mode counts).
  */
class DecontamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---------------- bloom sketch ----------------

  test("bloom: zero false negatives on 5000 inserted values") {
    val words = new Array[Long](BloomAgg.WORDS)
    val vs = (0L until 5000L).map(_ * 7919L + 13L)
    vs.foreach(BloomAgg.add(words, _))
    assert(vs.forall(BloomAgg.mayContain(words, _)))
  }

  test("bloom: false-positive rate bounded near theory at 4096 members") {
    val words = new Array[Long](BloomAgg.WORDS)
    (0L until 4096L).foreach(v => BloomAgg.add(words, v))
    val fill = BloomAgg.fill(words).toDouble / BloomAgg.BITS
    // fill ≈ 1 - e^(-K·n/BITS) = 0.221 at n = 4096
    assert(fill > 0.15 && fill < 0.30, s"fill $fill")
    val probes = (1L to 100000L).map(_ + 1000000L) // disjoint from members
    val fp = probes.count(BloomAgg.mayContain(words, _))
    // theory: fill^K ≈ 0.24%; allow generous slack
    assert(fp < 1000, s"false positives $fp / 100000")
    assert(fp > 0, "a mid-fill filter with zero FPs in 100k suggests a dead probe")
  }

  test("bloom: distributed merge == sequential build (assoc + commute)") {
    val vs = (0L until 2000L).map(_ * 104729L + 7L)
    val seq = new Array[Long](BloomAgg.WORDS)
    vs.foreach(BloomAgg.add(seq, _))
    val agg = new BloomAggregator
    val parts = vs.grouped(500).map { chunk =>
      chunk.foldLeft(agg.zero)(agg.reduce)
    }.toSeq
    val mergedLR = parts.reduceLeft(agg.merge)
    assert(mergedLR.sameElements(seq))
    val mergedRL = parts.reverse.reduceLeft(agg.merge)
    assert(mergedRL.sameElements(seq))
  }

  test("bloom: arithmetic-progression keys still spread (the q60 trap)") {
    // stride-64 ids — a bare multiplicative hash would alias these into
    // few words; the nonlinear mix must spread them across the bitset
    val words = new Array[Long](BloomAgg.WORDS)
    (0L until 1024L).foreach(i => BloomAgg.add(words, i * 64L))
    val touched = words.count(_ != 0L)
    assert(touched > 1024, s"only $touched of 2048 words touched") // ≥half
  }

  // ---------------- decontamination ----------------

  /** Exact model: full n-gram join, no bloom. */
  private def exactModel(corpus: Seq[(Long, String)], evalDocs: Seq[String],
                         n: Int): Map[Long, Long] = {
    def grams(t: String): Set[String] =
      t.split(" ", -1).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    val evalGrams = evalDocs.flatMap(grams).toSet
    corpus.map { case (id, t) => id -> grams(t).count(evalGrams.contains).toLong }
      .filter(_._2 > 0).toMap
  }

  test("decontaminate == exact join on a random corpus; planted leak found") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def doc(): String =
      Seq.fill(6 + rng.nextInt(10))(vocab(rng.nextInt(vocab.length))).mkString(" ")
    val evalDocs = Seq.fill(5)(doc())
    // plant: doc 9000 embeds a verbatim eval span (guaranteed 3-gram leak)
    val planted = 9000L -> ("xx " + evalDocs.head + " yy")
    val corpus = (0L until 300L).map(i => (i, doc())) :+ planted
    val expect = exactModel(corpus, evalDocs, n = 3)
    assert(expect.contains(9000L), "construction: the planted doc must leak")

    val corpusDf = corpus.toDF("doc_id", "text")
    val evalDf = evalDocs.map(t => (0L, t)).toDF("doc_id", "text")
    val got = Decontaminate.contaminatedDocs(corpusDf, evalDf, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("decontaminate plan: broadcast joins only, no shuffle join of the corpus") {
    import spark.implicits._
    val corpusDf = (0L until 50L).map(i => (i, s"a b c d$i e")).toDF("doc_id", "text")
    val evalDf = Seq((0L, "a b c")).toDF("doc_id", "text")
    val out = Decontaminate.contaminatedDocs(corpusDf, evalDf, "doc_id", "text", 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("wordNgrams: short docs yield empty, exact window otherwise") {
    import spark.implicits._
    val df = Seq("a b", "a b c", "a b c d").toDF("t")
      .select(Decontaminate.wordNgrams(col("t"), 3).as("g"))
    val got = df.collect().map(_.getSeq[String](0).toList)
    assert(got(0) == Nil)
    assert(got(1) == List("a b c"))
    assert(got(2) == List("a b c", "b c d"))
  }

  // ---------------- repetition stats ----------------

  test("maxMultiplicity == definitional mode count on random arrays") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val vocab = Vector("x", "y", "z", "w", "v")
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(30))(vocab(rng.nextInt(vocab.length))))
    }
    val df = rows.toDF("id", "arr")
      .select(col("id"), Repetition.maxMultiplicity(col("arr")).as("m"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = rows.map { case (id, arr) =>
      id -> (if (arr.isEmpty) 0L
             else arr.groupBy(identity).values.map(_.size).max.toLong)
    }.toMap
    assert(got == expect)
  }

  test("repetition stats: exact columns on a constructed corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),            // top token 4, bigram "a a" ×3
      (2L, "a b a b a"),          // top token 3 (a), top bigram 2
      (3L, "solo"),               // 1 token, 0 bigrams
      (4L, "p q r s t u v w x y z0 z1") // 12 distinct: 11 bigrams, passes 1×10 ≤ 11
    ).toDF("doc_id", "text")
    val got = Repetition.stats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    def row(i: Int) = got(i)
    assert(row(0).getLong(1) == 4 && row(0).getLong(3) == 4 &&
      row(0).getLong(4) == 3 && row(0).getLong(6) == 3 && !row(0).getBoolean(7))
    assert(row(1).getLong(3) == 3 && row(1).getLong(6) == 2)
    assert(row(2).getLong(1) == 1 && row(2).getLong(4) == 0 &&
      row(2).getLong(6) == 0 && !row(2).getBoolean(7))
    assert(row(3).getLong(2) == 12 && row(3).getLong(3) == 1 &&
      row(3).getBoolean(7))
  }

  // ---------------- PII redaction ----------------

  test("redact: masks all occurrences, fixed order, per-stage audit counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a1@x.com and b2@y.org plus 10.0.0.1 and +1-23-456"),
      (2L, "no pii here at all"),
      (3L, "adjacent 1.2.3.4 5.6.7.8 and w9@ex.com"),
      (4L, "digits near dots 1.2 not an ip, +5 not a phone"),
      (5L, "real-world john.doe+tag@my-site.com fully masked"),
      (6L, "dotted phone +1.555.123.4567 is a phone, not an ip"),
      (7L, "phone then ip +1-23-456 10.0.0.1 stay separate")
    ).toDF("doc_id", "text")
    val got = graft.ops.Redact.stats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getString(4) == "mail <EMAIL> and <EMAIL> plus <IP> and <PHONE>")
    assert(got(0).getInt(1) == 2 && got(0).getInt(2) == 1 && got(0).getInt(3) == 1)
    assert(got(1).getString(4) == "no pii here at all" &&
      got(1).getInt(1) + got(1).getInt(2) + got(1).getInt(3) == 0)
    assert(got(2).getString(4) == "adjacent <IP> <IP> and <EMAIL>")
    // partial look-alikes stay untouched: 1.2 is not an IPv4, +5 no digits after
    assert(got(3).getString(4) == "digits near dots 1.2 not an ip, +5 not a phone")
    // dotted locals, plus-tags, hyphenated domains: no PII fragments leak
    assert(got(4).getString(4) == "real-world <EMAIL> fully masked")
    assert(got(4).getInt(1) == 1)
    // PHONE runs before IP: a dotted phone is audited as a phone
    assert(got(5).getString(4) == "dotted phone <PHONE> is a phone, not an ip")
    assert(got(5).getInt(2) == 0 && got(5).getInt(3) == 1)
    // ...and a space-separated ip after a phone is still an ip
    assert(got(6).getString(4) == "phone then ip <PHONE> <IP> stay separate")
    assert(got(6).getInt(2) == 1 && got(6).getInt(3) == 1)
  }

  // ---------------- normalized dedup keys ----------------

  test("normKey: case/digit/punct/whitespace-insensitive, word-splitting, idempotent") {
    import spark.implicits._
    val df = Seq(
      (1L, "The Quick  Brown fox"),
      (2L, "  the quick brown FOX!! 42 "),   // must collapse onto 1
      (3L, "foo,bar"),                        // punctuation SPLITS, not fuses
      (4L, "foo bar"),                        // ... so 3 == 4
      (5L, "foobar")                          // distinct from 3/4
    ).toDF("doc_id", "text")
    val keys = graft.ops.Normalize.withKey(df, "text")
      .orderBy("doc_id").select("key_md5").as[String].collect()
    assert(keys(0) == keys(1) && keys(2) == keys(3) && keys(2) != keys(4))
    // idempotence: normalizing an already-normal string is a no-op
    val norm = df.select(graft.ops.Normalize.normKey($"text").as("n"))
      .select(graft.ops.Normalize.normKey($"n") === $"n").as[Boolean].collect()
    assert(norm.forall(identity))
  }

  test("normalized dedup: noisy twins collapse; min-id keeper; groupBy shape") {
    import spark.implicits._
    val df = Seq(
      (10L, "alpha beta"), (11L, "  ALPHA, beta!  "), (12L, "gamma")
    ).toDF("doc_id", "text")
    val got = graft.ops.Normalize.dedup(df, "doc_id", "text")
      .orderBy("keeper").collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 10L)
    assert(got(1).getLong(1) == 1L && got(1).getLong(2) == 12L)
    // dedup is a hash groupBy — partial aggregation below the Exchange
    val plan = graft.ops.Normalize.dedup(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("CartesianProduct"))
  }

  // ---------------- URL / domain extraction ----------------

  test("urls: host extraction, www-strip, case norm, two-label apex, stats") {
    import spark.implicits._
    val df = Seq(
      (1L, "see https://WWW.Sub.Ex-A.com/p?q=1 and http://b.org/x"),
      (2L, "bare https://ex-a.com/y plus https://cdn.Ex-A.com/z"),
      (3L, "no urls here at all"),
      (4L, "dotless http://localhost/a and ip http://192.168.0.1/b")
    ).toDF("doc_id", "text")
    val got = graft.ops.Urls.domainStats(df, "doc_id", "text")
      .orderBy("apex").collect()
    // apexes: ip-literal and dotless hosts keep the WHOLE host (no fake
    // "0.1" octet-pair apex, no shared "" group), then b.org, ex-a.com
    assert(got.map(_.getString(0)).toSeq ==
      Seq("192.168.0.1", "b.org", "ex-a.com", "localhost"))
    assert(got(1).getLong(1) == 1L && got(1).getLong(2) == 1L && got(1).getLong(3) == 1L)
    assert(got(2).getLong(1) == 3L && got(2).getLong(2) == 2L && got(2).getLong(3) == 1L)
    // doc 3 contributes nothing: empty extract array explodes to no rows
    assert(got.map(_.getLong(1)).sum == 6L)
    // normalizeHost strips exactly one leading www., lowercases
    val n = df.sparkSession.range(1).select(
      graft.ops.Urls.normalizeHost(lit("WWW.Mirror.Ex.COM")).as("h"))
      .as[String].head()
    assert(n == "mirror.ex.com")
  }

  test("repetition plan: row-local — no Exchange at all") {
    import spark.implicits._
    val df = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val plan = Repetition.stats(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
