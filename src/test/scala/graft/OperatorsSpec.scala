package graft

import org.apache.spark.sql.functions._
import graft.functions.{Similarity, TextFunctions}
import graft.operators.{Dedup, Multimodal}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles handles short documents") {
    val df = Seq("one two three four", "one two", "").toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("one two three", "two three four"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq.empty)
  }

  test("shingles (codegen ShingleStrings) matches the HOF formulation exactly") {
    // the r21 codegen kernel must be bit-identical to the expression it
    // replaced: when(size>=n, array_distinct(transform(sequence(1, m-n+1),
    // i => concat_ws(" ", slice(w, i, n))))).otherwise(array())
    def oldShingles(text: org.apache.spark.sql.Column, n: Int) = {
      val w = split(text, " ")
      when(size(w) >= n,
        array_distinct(
          transform(
            sequence(lit(1), size(w) - (n - 1)),
            i => concat_ws(" ", slice(w, i, lit(n))))))
        .otherwise(array().cast("array<string>"))
    }
    val rows = Seq(
      "one two three four five",
      "one two",             // shorter than n
      "",                    // empty text -> [""] token
      "a a a a a a",         // heavy repeats: distinct order matters
      "x  y z w",            // double space -> empty token mid-array
      " lead and trail ",    // leading/trailing empties from split -1
      "exactly three words", // m == n
      null.asInstanceOf[String])
    for (n <- Seq(1, 2, 3, 4)) {
      val df = rows.toDF("text")
      val got = df.select(TextFunctions.shingles(col("text"), n).as("s"))
        .collect().map(r => r.getSeq[String](0))
      val want = df.select(oldShingles(col("text"), n).as("s"))
        .collect().map(r => r.getSeq[String](0))
      assert(got.toSeq == want.toSeq, s"n=$n")
    }
  }

  test("removeNgrams kernel matches the HOF formulation exactly") {
    import org.apache.spark.sql.{Column, DataFrame}
    import org.apache.spark.sql.GraftColumnShim
    // the r21 codegen kernel vs the literal old higher-order chain
    def oldRemove(df: DataFrame, textCol: String, grams: Seq[String],
                  n: Int): DataFrame = {
      def inGrams(c: Column): Column = GraftColumnShim.column(
        graft.functions.catalyst.InStringSet(
          GraftColumnShim.expression(c), grams))
      val w = split(col(textCol), " ")
      val m = size(w)
      val starts = when(m >= n, sequence(lit(0), m - n))
        .otherwise(array().cast("array<int>"))
      val hitStarts = filter(starts,
        i => inGrams(concat_ws(" ", slice(w, i + 1, lit(n)))))
      val covered = array_distinct(flatten(
        transform(hitStarts, i => sequence(i, i + n - 1))))
      val keptIdx = array_except(sequence(lit(0), m - 1), covered)
      df.withColumn("cleaned",
          when(col(textCol).isNull, lit(null).cast("string"))
            .otherwise(concat_ws(" ",
              transform(keptIdx, p => element_at(w, p + 1)))))
        .withColumn("n_removed_words",
          coalesce(size(covered), lit(0)).cast("long"))
    }
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .limit(200)
      .unionByName(Seq(
        (9001L, "x  y z x  y"), // double spaces: empty-string words
        (9002L, " lead trail "),
        (9003L, ""), (9004L, null.asInstanceOf[String]),
        (9005L, "a b c a b c a b")).toDF("doc_id", "text"))
    val grams = graft.operators.Boilerplate
      .frequentNgrams(corpus, "doc_id", "text", n = 3, minDf = 3L, topK = 20)
      .collect().map(_.getString(0)).toSeq ++ Seq("a b c", "x  y")
    def rows(df: DataFrame) = df
      .select(col("doc_id"), col("cleaned"), col("n_removed_words"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2)))).toMap
    assert(rows(graft.operators.Boilerplate
        .removeNgrams(corpus, "text", grams, 3)) ==
      rows(oldRemove(corpus, "text", grams, 3)))
  }

  test("stripRepeatedSpans kernels match the HOF formulation exactly") {
    import org.apache.spark.sql.{Column, DataFrame}
    // the literal old operator (positioned-shingle transform + ranges/
    // array_except rewrite) vs the r21 kernels, over a real corpus slice
    def oldStrip(df: DataFrame, idCol: String, textCol: String,
                 k: Int): DataFrame = {
      val w0 = split(col(textCol), " ")
      val occ = df
        .select(col(idCol).as("__id"), w0.as("__w"))
        .select(col("__id"), explode(
          when(size(col("__w")) >= k,
            transform(sequence(lit(0), size(col("__w")) - k),
              i => struct(i.as("start"),
                concat_ws(" ", slice(col("__w"), i + 1, lit(k))).as("g"))))
            .otherwise(array().cast("array<struct<start:int,g:string>>")))
          .as("o"))
        .select(col("__id"), col("o.start").as("start"), col("o.g").as("g"))
      val firsts = occ.groupBy(col("g")).agg(
        count(lit(1)).as("__n"),
        min(struct(col("__id"), col("start"))).as("__first"))
        .filter(col("__n") >= 2)
      val tagged = occ.join(firsts, Seq("g"))
        .withColumn("__isFirst",
          col("__id") === col("__first.__id") &&
            col("start") === col("__first.start"))
      val nonFirst = tagged.filter(!col("__isFirst"))
        .select(col("__id").as(idCol), col("start"))
      val firstSpans = tagged.filter(col("__isFirst"))
        .select(col("__id").as(idCol), col("start"))
      val covered = nonFirst.groupBy(col(idCol))
        .agg(collect_list(col("start")).as("__starts"))
      val protectedS = firstSpans.groupBy(col(idCol))
        .agg(collect_list(col("start")).as("__pstarts"))
      val joined = df.join(covered, Seq(idCol), "left")
        .join(protectedS, Seq(idCol), "left")
      val w = split(col(textCol), " ")
      val m = size(w)
      def ranges(c: Column): Column = array_distinct(flatten(transform(
        coalesce(c, array().cast("array<int>")),
        s => sequence(s, s + k - 1))))
      val cov = array_except(ranges(col("__starts")), ranges(col("__pstarts")))
      val keptIdx = array_except(sequence(lit(0), m - 1), cov)
      joined
        .withColumn("cleaned",
          when(col(textCol).isNull, lit(null).cast("string"))
            .otherwise(concat_ws(" ",
              transform(keptIdx, p => element_at(w, p + 1)))))
        .withColumn("n_removed_words",
          coalesce(size(cov), lit(0)).cast("long"))
        .drop("__starts", "__pstarts")
    }
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .limit(150)
      .unionByName(Seq(
        (9001L, "p q r s p q r s"),
        (9002L, "x  y z x  y z"), // double spaces inside repeated spans
        (9003L, ""), (9004L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    def rows(df: DataFrame) = df
      .select(col("doc_id"), col("cleaned"), col("n_removed_words"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2)))).toMap
    assert(rows(graft.operators.SubstringDedup
        .stripRepeatedSpans(corpus, "doc_id", "text", k = 3)) ==
      rows(oldStrip(corpus, "doc_id", "text", k = 3)))
  }

  test("redactPII replaces each shape with its tag; piiCount audits them") {
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "ssn 987-65-4321 phone 415-555-0199 host 192.168.10.255",
      "no pii here 12345",
      "two mails a@b.co c@d.io").toDF("text")
    val got = df.select(
      TextFunctions.redactPII(col("text")).as("clean"),
      TextFunctions.piiCount(col("text")).as("n")).collect()
    assert(got(0).getString(0) == "mail <EMAIL> now" && got(0).getLong(1) == 1)
    assert(got(1).getString(0) == "ssn <SSN> phone <PHONE> host <IP>" &&
      got(1).getLong(1) == 3)
    assert(got(2).getString(0) == "no pii here 12345" && got(2).getLong(1) == 0)
    assert(got(3).getString(0) == "two mails <EMAIL> <EMAIL>" &&
      got(3).getLong(1) == 2)
  }

  test("wordCount / stopwordRatio / fingerprint are deterministic") {
    val df = Seq(("a", "the fast cat the end")).toDF("id", "text")
    val r1 = df.select(
      TextFunctions.wordCount(col("text")),
      TextFunctions.stopwordRatio(col("text"), Seq("the", "a")),
      TextFunctions.fingerprint(col("text"))).head()
    assert(r1.getLong(0) == 5)
    assert(r1.getDouble(1) == 0.4)
    val r2 = df.select(TextFunctions.fingerprint(col("text"))).head()
    assert(r1.getLong(2) == r2.getLong(0))
    assert(r1.getLong(2) >= 0 && r1.getLong(2) < 1000000007L)
  }

  test("languageId picks the dominant stopword language") {
    val df = Seq(
      "the cat is in the bag", // en
      "el perro es un animal que ladra", // es
      "xyzzy plugh").toDF("text") // no hits -> default en
    val got = df.select(TextFunctions.languageId(col("text"))).collect()
      .map(_.getString(0))
    assert(got sameElements Array("en", "es", "en"))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again today"),
    (2L, "the quick brown fox jumps over the lazy dog again today"), // dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again today"), // near-dup
    (4L, "completely different words forming another sentence entirely here now")
  ).toDF("doc_id", "text")

  test("exactKeepFirst keeps min id and counts dups") {
    val got = Dedup.exactKeepFirst(docs, "text", "doc_id").collect()
    assert(got.length == 3)
    val dup = got.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L) // keep_id = min(1, 2)
  }

  test("exactKeepFirstByHash ≡ exactKeepFirst (keep decisions), " +
      "fixed-width shuffle keys, null-safe") {
    import org.apache.spark.sql.functions.lit
    val withNulls = docs.unionByName(
      Seq((5L, null: String), (6L, null: String), (7L, ""))
        .toDF("doc_id", "text"))
    def decisions(df: org.apache.spark.sql.DataFrame) = df
      .select("keep_id", "dup_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // compared on the RAW column: null text is its own group in both
    // forms (groupBy's null bucket), distinct from empty text
    val byText = decisions(Dedup.exactKeepFirst(withNulls, "text", "doc_id"))
    val byHash = decisions(Dedup.exactKeepFirstByHash(
      withNulls, "text", "doc_id"))
    assert(byHash == byText,
      s"hash-keyed decisions must equal text-keyed: $byHash vs $byText")
    // nulls (5,6) group together; empty text (7) stays separate
    assert(byHash.contains((5L, 2L)) && byHash.contains((7L, 1L)))
    // the text-exact verify mode agrees with both
    val byHashExact = decisions(Dedup.exactKeepFirstByHash(
      withNulls, "text", "doc_id", verifyTextExact = true))
    assert(byHashExact == byText, "verifyTextExact mode must also agree")
    // duplicate groups carry the verified text fingerprint
    val out = Dedup.exactKeepFirstByHash(withNulls, "text", "doc_id")
    assert(out.columns.toSeq ==
      Seq("text_len", "text_hash", "keep_id", "dup_count"))
  }

  test("minhash LSH finds the exact duplicate pair") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      numHashes = 32, bands = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"got $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("connectedComponents: transitivity, disjoint clusters, empty input") {
    import spark.implicits._
    // chain 1-2-3 (1 and 3 never paired directly) + disjoint pair 5-6
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("qa", "qb")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))

    // a longer chain still converges (diameter > 2)
    val chain = (1L until 7L).map(i => (i, i + 1)).toDF("qa", "qb")
    val c2 = Dedup.connectedComponents(chain).collect().map(_.getLong(1)).toSet
    assert(c2 == Set(1L))

    assert(Dedup.connectedComponents(Seq.empty[(Long, Long)].toDF("qa", "qb"))
      .collect().isEmpty)
  }

  test("connectedComponents: deep chains converge in O(log d) and maxIter is loud") {
    import spark.implicits._
    // a 120-node path has diameter 119: plain min-propagation would need
    // ~119 rounds; pointer jumping must land it well inside 12
    val path = (0L until 119L).map(i => (i, i + 1)).toDF("qa", "qb")
    val comps = Dedup.connectedComponents(path, maxIter = 12).collect()
    assert(comps.length == 120 && comps.forall(_.getLong(1) == 0L))

    // an unconverged exit must THROW, never return partial labels
    // (diameter 39 cannot finish in 2 rounds even with jumping)
    val long = (0L until 39L).map(i => (i, i + 1)).toDF("qa", "qb")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(long, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("converge"))
  }

  test("keepCanonical keeps cluster minima and singletons") {
    import spark.implicits._
    val rows = Seq(1L, 2L, 3L, 5L, 6L, 9L).map(i => (i, s"t$i")).toDF("id", "t")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("qa", "qb")
    val kept = Dedup.keepCanonical(rows, "id", pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 5L, 9L)) // cluster minima + untouched singleton
  }

  test("incrementalAdmission: corpus dups drop, fresh keep, batch picks canonical") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "completely different corpus text about spark shuffles")
    ).toDF("doc_id", "text")
    val idx = Dedup.minhashBandIndex(corpus, "doc_id", "text",
      numHashes = 32, bands = 16)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again"), // corpus dup
      (11L, "a genuinely fresh document with its own words here"), // keep
      (12L, "two copies inside the batch share this exact body"),  // canonical
      (13L, "two copies inside the batch share this exact body")   // batch dup
    ).toDF("doc_id", "text")
    val adm = Dedup.incrementalAdmission(idx, corpus, batch,
        "doc_id", "text", numHashes = 32, bands = 16)
      .select("doc_id", "dup_of_corpus", "batch_dup", "keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    assert(adm == Seq(
      (10L, true, false, false),
      (11L, false, false, true),
      (12L, false, false, true),
      (13L, false, true, false)))
  }

  test("incrementalAdmission: probeMaxBucket drops hot corpus buckets from the probe") {
    import spark.implicits._
    // five corpus copies of one text -> every band bucket for it has 5 members
    val corpus = (1L to 5L)
      .map(i => (i, "hot boilerplate text repeated across the whole corpus"))
      .toDF("doc_id", "text")
    val idx = Dedup.minhashBandIndex(corpus, "doc_id", "text",
      numHashes = 32, bands = 16)
    val batch = Seq(
      (10L, "hot boilerplate text repeated across the whole corpus"))
      .toDF("doc_id", "text")
    def dupFlag(cap: Int): Boolean =
      Dedup.incrementalAdmission(idx, corpus, batch, "doc_id", "text",
          numHashes = 32, bands = 16, probeMaxBucket = cap)
        .select("dup_of_corpus").as[Boolean].head()
    assert(dupFlag(10000), "under the cap the corpus dup is found")
    assert(!dupFlag(4), "buckets over the cap are excluded from the probe")
  }

  test("incrementalAdmission: null texts are null-safe dups; index param mismatch is loud") {
    import spark.implicits._
    val corpus = Seq((1L, Option("some corpus text"))).toDF("doc_id", "text")
    val idx = Dedup.minhashBandIndex(corpus, "doc_id", "text",
      numHashes = 32, bands = 16)
    // two NULL-text batch docs: <=> verification makes them a dup pair
    // (the PARTITION BY / groupBy semantics), so one canonical survives
    val batch = Seq((10L, None: Option[String]), (11L, None: Option[String]))
      .toDF("doc_id", "text")
    val adm = Dedup.incrementalAdmission(idx, corpus, batch, "doc_id", "text",
        numHashes = 32, bands = 16)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(adm == Seq((10L, true), (11L, false)))
    // a probe with different LSH parameters than the stored index refuses
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalAdmission(idx, corpus, batch, "doc_id", "text",
        numHashes = 32, bands = 8)
    }
    assert(e.getMessage.contains("mismatched probe"))
  }

  test("incrementalAdmission: orphan index rows (no corpus doc) are ignored") {
    import spark.implicits._
    // the admission sink's crash window strands index rows whose doc never
    // made it into the corpus; the probe's verify join must drop them so
    // the replayed batch is admitted, not phantom-rejected
    val corpus = Seq((1L, "a corpus document that really exists")).toDF("doc_id", "text")
    val orphan = Seq((99L, "stranded text whose corpus row never committed"))
      .toDF("doc_id", "text")
    val idx = Dedup.minhashBandIndex(corpus.unionByName(orphan),
      "doc_id", "text", numHashes = 32, bands = 16)
    val batch = Seq((10L, "stranded text whose corpus row never committed"))
      .toDF("doc_id", "text")
    val adm = Dedup.incrementalAdmission(idx, corpus, batch, "doc_id", "text",
        numHashes = 32, bands = 16)
      .select("doc_id", "dup_of_corpus", "keep")
      .as[(Long, Boolean, Boolean)].head()
    assert(adm == ((10L, false, true)),
      "a doc colliding only with orphan index rows must be admitted")
  }

  test("simhash of identical docs is identical, near-dup is close") {
    val sig = Dedup.simhash64(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    val ham13 = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    val ham14 = java.lang.Long.bitCount(sig(1L) ^ sig(4L))
    assert(ham13 < ham14, s"near-dup $ham13 should beat unrelated $ham14")
  }

  test("ngram jaccard: dup pair = 1.0, near-dup in (0,1)") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.0 && j((1L, 3L)) < 1.0)
    assert(!j.contains((1L, 4L)))
  }

  test("hot bucket above maxBucket is dropped; small buckets still pair") {
    // 6 identical docs (every band bucket holds all 6) + 1 distinct pair
    val hot = (10L to 15L).map(i =>
      (i, "all these documents share exactly the same body text verbatim"))
    val pair = Seq(
      (20L, "a rare second group with its own matching body right here ok"),
      (21L, "a rare second group with its own matching body right here ok"))
    val df = (hot ++ pair).toDF("doc_id", "text")
    // cap below the hot group: only the 2-doc bucket may emit pairs
    val capped = Dedup.minhashCandidatePairs(df, "doc_id", "text",
      numHashes = 32, bands = 8, maxBucket = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((20L, 21L)), s"got $capped")
    // cap at exactly the hot-bucket size: boundary is inclusive
    val atCap = Dedup.minhashCandidatePairs(df, "doc_id", "text",
      numHashes = 32, bands = 8, maxBucket = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atCap.size == 15 + 1, s"6C2 hot pairs + 1: got ${atCap.size}")
    // same guard on the simhash path
    val sCapped = Dedup.simhashPairs(df, "doc_id", "text", maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sCapped == Set((20L, 21L)), s"got $sCapped")
  }

  test("bucketPairs shuffles the banded set once (no election join)") {
    // the hot-bucket guard must live INSIDE the aggregate: a pre-election
    // (groupBy.count + semi join) plans a second exchange + join over the
    // banded set — the r17 measured ~2x regression on this family
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      numHashes = 32, bands = 8)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("LeftSemi"),
      "bucket election must not plan a semi join over the banded set")
    // the whole pipeline (signature window + band agg + final distinct)
    // plans a fixed small number of exchanges; the election shape added
    // one more plus a join — pin the ceiling
    val nEx = "Exchange ".r.findAllIn(plan).size
    assert(nEx <= 4, s"expected <= 4 exchanges, got $nEx in:\n$plan")
  }

  test("BoundedCollectAgg: exact count, list freed over cap, merge-safe") {
    import org.apache.spark.sql.GraftColumnShim
    val df = spark.range(0, 100, 1, 8) // 8 partitions force partial merges
      .select((col("id") % 3).as("k"), col("id").as("v"))
    val agg = GraftColumnShim.column(
      graft.functions.catalyst.BoundedCollectAgg(
        GraftColumnShim.expression(col("v")), 40).toAggregateExpression())
    val got = df.groupBy("k").agg(agg.as("bc"))
      .select(col("k"), col("bc.cnt"), size(col("bc.items")).as("n"),
        col("bc.items").as("items"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getSeq[Long](3).toSet)).toMap
    // keys 0/1 have 34/33 members (<= 40): full lists, exact counts
    assert(got(0L)._1 == 34 && got(0L)._2 == 34)
    assert(got(0L)._3 == (0L until 100L by 3).toSet)
    assert(got(1L)._1 == 33 && got(1L)._2 == 33)
    assert(got(2L)._1 == 33 && got(2L)._2 == 33)
    // over-cap: exact count survives, items are empty (never buffered)
    val agg2 = GraftColumnShim.column(
      graft.functions.catalyst.BoundedCollectAgg(
        GraftColumnShim.expression(col("v")), 10).toAggregateExpression())
    val over = df.groupBy("k").agg(agg2.as("bc"))
      .select(col("bc.cnt"), size(col("bc.items"))).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(over == Set((34L, 0), (33L, 0)), s"got $over")
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot and cosine match hand computation") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")),
      Similarity.cosine(col("a"), col("a"))).head()
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
  }

  test("bruteForceTopK ranks the nearest vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),   // closest to 0
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0L), vecs, k = 2).collect()
      .sortBy(_.getLong(3))
    assert(top.head.getLong(1) == 1L)   // rank 1 -> vec 1
    assert(top(1).getLong(1) == 2L)     // rank 2 -> vec 2
  }

  test("lshTopK returns a subset of brute-force candidates with scores") {
    val emb = Tables.load(spark, sf, "embeddings")
    val got = Similarity.lshTopK(
      emb.filter(col("vec_id") < 3), emb, k = 3, nBits = 4).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getLong(3) <= 3))
  }
}

class MultimodalSpec extends SparkSpec {

  test("extractFeatures is deterministic with fixed feature dim") {
    implicit val s = spark
    val media = Multimodal.asMediaTable(
      Tables.load(spark, sf, "documents").limit(20), "doc_id", "text")
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length == 20)
    assert(f1.forall(_.features.length == Multimodal.FakeDecoder.featureDim))
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(m => m.payload_len > 0))
  }

  test("sampleFrames strides over video frames only") {
    implicit val s = spark
    val media = Multimodal.asMediaTable(
      Tables.load(spark, sf, "documents").limit(30), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, every = 8).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getInt(2) % 8 == 0))
    // every sampled media item is a "video" (doc_id % 3 == 2)
    assert(frames.forall(_.getLong(0) % 3 == 2))
  }
}
