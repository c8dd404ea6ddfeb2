package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Differential query fuzzer: generate N random aggregate queries from a
  * deterministic grammar restricted to the Spark∩DuckDB ANSI subset, run
  * them on Spark, and dump results + the SQL in the Verify contract's
  * format — `tools/check_oracle.py <outDir> <sfDir>` then replays every
  * query in DuckDB and value-compares. One seed = one reproducible
  * corpus, so a mismatch is a one-line repro.
  *
  * The grammar only emits FULLY DETERMINISTIC queries (aggregates grouped
  * by categorical columns, ordered by every group column NULLS FIRST,
  * doubles rounded — the declared-gate discipline), so any mismatch is an
  * engine-semantics bug, never an ordering artifact.
  *
  * Usage: `runMain graft.DiffFuzz [sfDir] [outDir] [seed] [count]`.
  */
object DiffFuzz {

  private final case class Col(name: String, kind: String) // num | cat | ts

  private val tables: Map[String, Seq[Col]] = Map(
    "orders" -> Seq(Col("o_orderkey", "num"), Col("o_custkey", "num"),
      Col("o_totalprice", "num"), Col("o_orderstatus", "cat"),
      Col("o_orderpriority", "cat"), Col("o_orderdate", "ts")),
    "lineitem" -> Seq(Col("l_orderkey", "num"), Col("l_quantity", "num"),
      Col("l_extendedprice", "num"), Col("l_discount", "num"),
      Col("l_returnflag", "cat"), Col("l_linestatus", "cat"),
      Col("l_shipdate", "ts")),
    "customer" -> Seq(Col("c_custkey", "num"), Col("c_acctbal", "num"),
      Col("c_nationkey", "num"), Col("c_mktsegment", "cat")),
    // events WITHOUT its ts column: the driver varies its physical
    // timestamp type by round (TESTDATA.md), and the fuzzer's DuckDB
    // replay reads the raw parquet — numeric/categorical columns only
    "events" -> Seq(Col("event_id", "num"), Col("user_id", "num"),
      Col("value", "num"), Col("event_type", "cat")))

  private val catValues: Map[String, Seq[String]] = Map(
    "o_orderstatus" -> Seq("F", "O", "P"),
    "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
    "l_returnflag" -> Seq("A", "N", "R"),
    "l_linestatus" -> Seq("F", "O"),
    "c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
    "event_type" -> Seq("click", "error", "purchase", "signup", "view"))

  private val numRange: Map[String, (Long, Long)] = Map(
    "o_orderkey" -> (0L, 15000L), "o_custkey" -> (0L, 1500L),
    "o_totalprice" -> (1000L, 400000L),
    "l_orderkey" -> (0L, 15000L), "l_quantity" -> (1L, 50L),
    "l_extendedprice" -> (1000L, 100000L), "l_discount" -> (0L, 1L),
    "c_custkey" -> (0L, 1500L), "c_acctbal" -> (-1000L, 10000L),
    "c_nationkey" -> (0L, 24L),
    "event_id" -> (0L, 10000L), "user_id" -> (0L, 150L),
    "value" -> (0L, 490L))

  private def pick[A](r: scala.util.Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  private def numLit(r: scala.util.Random, c: String): String = {
    val (lo, hi) = numRange(c)
    val v = lo + math.abs(r.nextLong()) % math.max(1L, hi - lo)
    if (c == "l_discount") f"0.0${r.nextInt(9)}%s" else v.toString
  }

  private def predicate(r: scala.util.Random, cols: Seq[Col]): String = {
    def leaf(): String = {
      val c = pick(r, cols)
      c.kind match {
        case "num" => pick(r, Seq("<", "<=", ">", ">=", "=")) match {
          case op => s"${c.name} $op ${numLit(r, c.name)}"
        }
        case "cat" =>
          val vs = catValues(c.name)
          r.nextInt(3) match {
            case 0 => s"${c.name} = '${pick(r, vs)}'"
            case 1 => s"${c.name} IN (${r.shuffle(vs).take(1 + r.nextInt(2))
              .map(v => s"'$v'").mkString(", ")})"
            case _ => // LIKE on a value prefix — identical semantics in
                      // Spark and DuckDB for plain %-patterns. Sampled
                      // values containing % _ or ' must be escaped or the
                      // pattern changes meaning; the escape char is `!`
                      // (never backslash: the two engines disagree on
                      // backslash handling INSIDE string literals).
              val v = pick(r, vs)
              val raw = v.take(1 + r.nextInt(math.max(1, v.length)))
              val pat =
                if (raw.exists(ch => ch == '%' || ch == '_' || ch == '!')) {
                  val esc = raw.flatMap {
                    case '!' => "!!"
                    case '%' => "!%"
                    case '_' => "!_"
                    case ch => ch.toString
                  }
                  s"'${esc.replace("'", "''")}%' ESCAPE '!'"
                } else s"'${raw.replace("'", "''")}%'"
              s"${c.name} LIKE $pat"
          }
        case "ts" =>
          val y = 1995 + r.nextInt(4)
          s"${c.name} ${pick(r, Seq("<", ">="))} TIMESTAMP '$y-0${1 + r.nextInt(9)}-15 00:00:00'"
      }
    }
    (1 to (1 + r.nextInt(3))).map(_ => leaf())
      .mkString(if (r.nextBoolean()) " AND " else " OR ")
  }

  /** Equi-join pairs sharing this schema's foreign keys. */
  private val joins: Seq[(String, String, String)] = Seq(
    ("orders", "customer", "o_custkey = c_custkey"),
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("events", "customer", "user_id = c_custkey"))

  /** Tables with a UNIQUE key — the total-order tiebreak every
    * deterministic window needs. */
  private val uniqueKey: Map[String, String] =
    Map("orders" -> "o_orderkey", "customer" -> "c_custkey",
      "events" -> "event_id")

  /** One deterministic WINDOW query: every OVER clause orders by a total
    * order (value columns + the unique key as final tiebreak), and
    * windowed SUM/COUNT stay in INTEGER space — engines disagree on the
    * summation order of windowed doubles (segment trees vs running
    * sums), so fractional rolling sums are out of the common dialect. */
  def genWindowQuery(r: scala.util.Random): String = {
    val t = pick(r, uniqueKey.keys.toSeq.sorted)
    val key = uniqueKey(t)
    val cols = tables(t)
    val cats = cols.filter(_.kind == "cat")
    val part = if (cats.nonEmpty && r.nextBoolean())
      s"PARTITION BY ${pick(r, cats).name} " else ""
    val value = pick(r, cols.filter(_.kind == "num")).name
    // explicit NULLS placement INSIDE the window too: Spark defaults
    // ASC to NULLS FIRST, DuckDB to NULLS LAST — latent until a
    // nullable column joins the grammar, then every rank diverges
    val ord = s"ORDER BY $value ASC NULLS FIRST, $key ASC NULLS FIRST"
    val intCols = Set("o_orderkey", "o_custkey", "c_custkey", "c_nationkey",
      "event_id", "user_id")
    val sumCol = pick(r, cols.filter(c => intCols(c.name))).name
    val frame = pick(r, Seq(
      s"ROWS BETWEEN ${1 + r.nextInt(5)} PRECEDING AND CURRENT ROW",
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"))
    val fns = Seq(
      s"ROW_NUMBER() OVER ($part$ord) AS rn",
      s"${pick(r, Seq("RANK", "DENSE_RANK"))}() OVER ($part$ord) AS rk",
      s"CAST(SUM($sumCol) OVER ($part$ord $frame) AS BIGINT) AS rsum",
      s"LAG($key, ${1 + r.nextInt(2)}) OVER ($part$ord) AS lg") ++
      (if (r.nextInt(3) == 0)
         Seq(s"NTILE(${2 + r.nextInt(5)}) OVER ($part$ord) AS nt") else Nil)
    val where = s"WHERE ${predicate(r, cols)}"
    s"""SELECT $key AS k, ${fns.mkString(",\n       ")}
       |FROM $t
       |$where
       |ORDER BY k ASC NULLS FIRST""".stripMargin
  }

  /** One deterministic SET-OPERATION query: both arms project the same
    * column from differently-filtered slices, the result re-aggregated
    * so bag multiplicities are visible and ordered totally. */
  def genSetOpQuery(r: scala.util.Random): String = {
    val (t, cols) = pick(r, tables.toSeq.sortBy(_._1))
    val k = pick(r, cols.filter(_.kind == "num")).name
    val op = pick(r, Seq("UNION ALL", "UNION", "INTERSECT ALL", "INTERSECT",
      "EXCEPT ALL", "EXCEPT"))
    val p1 = predicate(r, cols)
    val p2 = predicate(r, cols)
    s"""SELECT k, COUNT(*) AS n FROM (
       |  SELECT $k AS k FROM $t WHERE $p1
       |  $op
       |  SELECT $k AS k FROM $t WHERE $p2
       |) GROUP BY k ORDER BY k ASC NULLS FIRST""".stripMargin
  }

  /** One deterministic STRING-function query: a random composition of
    * scalar functions from the Spark∩DuckDB common dialect (UPPER,
    * LOWER, SUBSTR, TRIM, REPLACE, REVERSE, LEFT, RIGHT, `||`) over a
    * categorical column, grouped and counted. String semantics are an
    * easy place for engines to drift (1-indexed SUBSTR bounds, empty-
    * string edges, concat null-propagation) — all deterministic, so any
    * mismatch is a real dialect bug. */
  def genStringQuery(r: scala.util.Random): String = {
    val (t, cols) = pick(r, tables.toSeq.sortBy(_._1))
    val c = pick(r, cols.filter(_.kind == "cat")).name
    def wrap(e: String, depth: Int): String =
      if (depth == 0) e
      else wrap(r.nextInt(9) match {
        case 0 => s"UPPER($e)"
        case 1 => s"LOWER($e)"
        case 2 => s"SUBSTR($e, ${1 + r.nextInt(3)}, ${1 + r.nextInt(5)})"
        case 3 => s"TRIM($e)"
        case 4 => s"REPLACE($e, '${"AEIOU".charAt(r.nextInt(5))}', '_')"
        case 5 => s"REVERSE($e)"
        case 6 => s"LEFT($e, ${1 + r.nextInt(4)})"
        case 7 => s"RIGHT($e, ${1 + r.nextInt(4)})"
        case 8 => s"($e || '#${r.nextInt(10)}')"
      }, depth - 1)
    val e = wrap(c, 1 + r.nextInt(2))
    val where = if (r.nextBoolean()) s"\nWHERE ${predicate(r, cols)}" else ""
    s"""SELECT $e AS e, COUNT(*) AS n,
       |       CAST(SUM(LENGTH($e)) AS BIGINT) AS tot_len
       |FROM $t$where
       |GROUP BY e ORDER BY e ASC NULLS FIRST""".stripMargin
  }

  /** Fractional "money" columns per table — inputs for the money/ratio
    * grammar below. */
  private val moneyCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_totalprice"),
    "lineitem" -> Seq("l_extendedprice"),
    "customer" -> Seq("c_acctbal"))

  /** One MONEY/RATIO query that enforces the repo's oracle dialect
    * MECHANICALLY: fractional amounts aggregate as per-row integer cents
    * with the OUTER BIGINT cast — `CAST(SUM(CAST(ROUND(x*100) AS BIGINT))
    * AS BIGINT)` — because DuckDB widens SUM(BIGINT) to HUGEINT, which
    * the driver's pandas materialization turns into float64 (the exact
    * class that failed q146/q149/q153 in round 11); and ratios emit as
    * integer basis points through `CAST(FLOOR(a * 10000.0 / b) AS
    * BIGINT)` — the one integer-ratio spelling BOTH engines parse (Spark
    * has DIV but DuckDB doesn't; DuckDB has // but Spark doesn't). The
    * invariant the gate rests on: both engines run the SAME bigint →
    * double conversion and IEEE-754 multiply/divide/floor, so the two
    * sides agree bit-for-bit even when a*10000 exceeds 2^53 and the
    * arithmetic is no longer exact (the small-SF fuzz corpora stay under
    * the bound; larger scale factors rely on the identical-ops form).
    * Never ROUND(double, d): a ULP coin-flip on a ratio is not a bug
    * either engine has. */
  def genMoneyQuery(r: scala.util.Random): String = {
    val (t, ms) = pick(r, moneyCols.toSeq.sortBy(_._1))
    val cols = tables(t)
    val m = pick(r, ms)
    val cents = s"CAST(ROUND($m * 100) AS BIGINT)"
    val g = pick(r, cols.filter(_.kind == "cat")).name
    val condPred = predicate(r, cols)
    val aggs = Seq(
      "COUNT(*) AS n",
      s"CAST(SUM($cents) AS BIGINT) AS total_cents",
      s"CAST(SUM(CASE WHEN $condPred THEN $cents ELSE 0 END) AS BIGINT)" +
        " AS part_cents") ++
      (if (r.nextBoolean())
         Seq(s"CAST(MIN($cents) AS BIGINT) AS min_cents",
           s"CAST(MAX($cents) AS BIGINT) AS max_cents")
       else Nil)
    val where = if (r.nextBoolean()) s"\nWHERE ${predicate(r, cols)}" else ""
    // basis points of the conditional slice over the total, integer-only;
    // groups can be all-zero under a narrow predicate, so guard the
    // denominator the same way on both engines
    s"""SELECT g, ${aggs.mkString(",\n       ")},
       |       CASE WHEN SUM($cents) = 0 THEN CAST(-1 AS BIGINT)
       |            ELSE CAST(FLOOR(SUM(CASE WHEN $condPred THEN $cents
       |                                     ELSE 0 END) * 10000.0
       |                            / SUM($cents)) AS BIGINT) END AS part_bp
       |FROM (SELECT *, $g AS g FROM $t)$where
       |GROUP BY g ORDER BY g ASC NULLS FIRST""".stripMargin
  }

  /** One deterministic aggregate query in the common dialect. */
  /** Array/list-function differential grammar — the one grammar whose SQL
    * DIFFERS per engine (Spark array_* vs DuckDB list_* names, same
    * semantics), so it returns (sparkSql, duckSql). Templates reduce
    * every array to a SCALAR (size, membership, k-th element, sorted
    * fingerprint string, min/max cast to double): the comparator's
    * repr-exact float check and pandas' differing array renderings make
    * array-VALUED output columns untestable, and none of these scalars
    * involves a float fold whose accumulation order could differ.
    * `documents.text` is ASCII space-separated words (split/sort parity
    * is byte-lexicographic on both engines); `embeddings.embedding` is
    * float32[64], where element extraction and min/max widen to double
    * bit-exactly. Out-of-range k: Spark try_element_at and DuckDB [k]
    * both yield NULL. */
  def genArrayQuery(r: scala.util.Random): (String, String) = {
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "the", "line",
      "sort", "window", "a", "zebra", "quantum") // last two never occur
    val m = pick(r, Seq(3, 5, 7, 11))
    val rem = r.nextInt(m)
    val ord = "ORDER BY doc_id ASC NULLS FIRST"
    r.nextInt(7) match {
      case 0 =>
        val w = s"WHERE doc_id % $m = $rem"
        (s"SELECT doc_id, size(split(text, ' ')) AS n_words, " +
           s"size(array_distinct(split(text, ' '))) AS n_uniq " +
           s"FROM documents $w $ord",
         s"SELECT doc_id, len(string_split(text, ' ')) AS n_words, " +
           s"len(list_distinct(string_split(text, ' '))) AS n_uniq " +
           s"FROM documents $w $ord")
      case 1 =>
        val word = pick(r, vocab)
        val g = pick(r, Seq("lang", "source"))
        (s"SELECT $g, CAST(SUM(CASE WHEN array_contains(split(text, ' '), " +
           s"'$word') THEN 1 ELSE 0 END) AS BIGINT) AS n_hit, COUNT(*) AS n " +
           s"FROM documents GROUP BY $g ORDER BY $g ASC NULLS FIRST",
         s"SELECT $g, CAST(SUM(CASE WHEN list_contains(string_split(text, " +
           s"' '), '$word') THEN 1 ELSE 0 END) AS BIGINT) AS n_hit, " +
           s"COUNT(*) AS n FROM documents GROUP BY $g " +
           s"ORDER BY $g ASC NULLS FIRST")
      case 2 =>
        val k = 1 + r.nextInt(8) // may exceed short docs: NULL on both
        val w = s"WHERE doc_id % $m = $rem"
        (s"SELECT doc_id, try_element_at(split(text, ' '), $k) AS w$k " +
           s"FROM documents $w $ord",
         s"SELECT doc_id, string_split(text, ' ')[$k] AS w$k " +
           s"FROM documents $w $ord")
      case 3 =>
        val w = s"WHERE doc_id % $m = $rem"
        (s"SELECT doc_id, array_join(array_sort(array_distinct(" +
           s"split(text, ' '))), ',') AS fp FROM documents $w $ord",
         s"SELECT doc_id, array_to_string(list_sort(list_distinct(" +
           s"string_split(text, ' '))), ',') AS fp FROM documents $w $ord")
      case 4 =>
        val k = 1 + r.nextInt(64) // embedding dim is 64: always in range
        val w = s"WHERE vec_id % $m = $rem"
        val o = "ORDER BY vec_id ASC NULLS FIRST"
        (s"SELECT vec_id, CAST(try_element_at(embedding, $k) AS DOUBLE) " +
           s"AS x$k FROM embeddings $w $o",
         s"SELECT vec_id, CAST(embedding[$k] AS DOUBLE) AS x$k " +
           s"FROM embeddings $w $o")
      case 5 =>
        val w = s"WHERE vec_id % $m = $rem"
        val o = "ORDER BY vec_id ASC NULLS FIRST"
        (s"SELECT vec_id, CAST(array_max(embedding) AS DOUBLE) AS mx, " +
           s"CAST(array_min(embedding) AS DOUBLE) AS mn FROM embeddings $w $o",
         s"SELECT vec_id, CAST(list_max(embedding) AS DOUBLE) AS mx, " +
           s"CAST(list_min(embedding) AS DOUBLE) AS mn FROM embeddings $w $o")
      case _ =>
        val w1 = pick(r, vocab); val w2 = pick(r, vocab)
        val g = pick(r, Seq("lang", "source"))
        (s"SELECT $g, CAST(SUM(CASE WHEN arrays_overlap(split(text, ' '), " +
           s"array('$w1', '$w2')) THEN 1 ELSE 0 END) AS BIGINT) AS n_any " +
           s"FROM documents GROUP BY $g ORDER BY $g ASC NULLS FIRST",
         s"SELECT $g, CAST(SUM(CASE WHEN list_has_any(string_split(text, " +
           s"' '), ['$w1', '$w2']) THEN 1 ELSE 0 END) AS BIGINT) AS n_any " +
           s"FROM documents GROUP BY $g ORDER BY $g ASC NULLS FIRST")
    }
  }

  def genQuery(r: scala.util.Random): String = {
    r.nextInt(9) match {
      case 0 => return genWindowQuery(r)
      case 1 => return genSetOpQuery(r)
      case 2 => return genStringQuery(r)
      case 3 => return genMoneyQuery(r)
      case _ => ()
    }
    // 1/3 of queries join two tables on a foreign key; predicates and
    // group/aggregate columns then draw from BOTH sides
    val (from, cols) =
      if (r.nextInt(3) == 0) {
        val (a, b, cond) = pick(r, joins)
        (s"$a JOIN $b ON $cond", tables(a) ++ tables(b))
      } else {
        val (t, cs) = pick(r, tables.toSeq.sortBy(_._1))
        (t, cs)
      }
    val cats = cols.filter(_.kind == "cat")
    val nums = cols.filter(_.kind == "num")
    val groupCols = r.shuffle(cats).take(r.nextInt(math.min(3, cats.size + 1)))
      .map(_.name)
    val aggTargets = r.shuffle(nums).take(1 + r.nextInt(2)).map(_.name)
    // integer-typed columns: SUM stays integral on both engines only
    // under an explicit BIGINT cast (DuckDB's ROUND would widen to
    // DOUBLE and the value comparison sees 42 vs 42.0)
    val intCols = Set("o_orderkey", "o_custkey", "l_orderkey",
      "c_custkey", "c_nationkey", "event_id", "user_id")
    val aggs = Seq("COUNT(*) AS c") ++ aggTargets.zipWithIndex.flatMap {
      case (n, i) =>
        val sum = if (intCols(n)) s"CAST(SUM($n) AS BIGINT) AS s$i"
          else s"ROUND(SUM($n), 2) AS s$i"
        Seq(sum, s"MIN($n) AS mn$i", s"MAX($n) AS mx$i") ++
          (if (r.nextInt(3) == 0) Seq(s"COUNT(DISTINCT $n) AS d$i") else Nil) ++
          // conditional aggregation: SUM(CASE WHEN pred THEN col ELSE 0)
          // — integer columns only, so the branch arms stay exact
          (if (intCols(n) && r.nextInt(3) == 0)
             Seq(s"CAST(SUM(CASE WHEN ${predicate(r, cols)} THEN $n " +
               s"ELSE 0 END) AS BIGINT) AS cs$i")
           else Nil)
    }
    val select = (groupCols ++ aggs).mkString(", ")
    val where = if (r.nextBoolean()) s"\nWHERE ${predicate(r, cols)}" else ""
    val group = if (groupCols.nonEmpty)
      s"\nGROUP BY ${groupCols.mkString(", ")}" else ""
    val having = if (groupCols.nonEmpty && r.nextInt(3) == 0)
      s"\nHAVING COUNT(*) > ${r.nextInt(50)}" else ""
    val order = if (groupCols.nonEmpty)
      s"\nORDER BY ${groupCols.map(_ + " ASC NULLS FIRST").mkString(", ")}"
    else ""
    s"SELECT $select\nFROM $from$where$group$having$order"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/difffuzz")
    val seed = args.lift(2).map(_.toLong).getOrElse(42L)
    val count = args.lift(3).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the array grammar draws from documents/embeddings on top of the
    // relational grammar's tables
    (tables.keys.toSeq ++ Seq("documents", "embeddings")).foreach(t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t))
    new java.io.File(outDir).mkdirs()
    val r = new scala.util.Random(seed)
    // 5th arg is a mode string: "money" restricts the corpus to the
    // money/ratio grammar (oracle-dialect stress); "canary" appends one
    // DELIBERATELY missing-cast query — Spark writes SUM(int) as int64
    // while DuckDB widens to HUGEINT (float64 through the driver's
    // pandas path), so the hardened check_oracle.py MUST flag it. A
    // canary that passes means the local gate has lost parity with the
    // driver's hash check again. Modes compose: "money,canary".
    val mode = args.lift(4).getOrElse("")
    // each entry is (name, (sparkSql, duckSql)) — identical for the ANSI
    // grammars, per-dialect for the array grammar (array_* vs list_*)
    val generated = (0 until count).map { i =>
      f"fz$i%04d" -> {
        if (mode.contains("money")) { val q = genMoneyQuery(r); (q, q) }
        else if (mode.contains("array")) genArrayQuery(r)
        else { val q = genQuery(r); (q, q) }
      }
    }
    val queries =
      if (mode.contains("canary")) {
        val c = "SELECT o_orderstatus, SUM(o_orderkey) AS s FROM orders " +
          "GROUP BY o_orderstatus ORDER BY o_orderstatus ASC NULLS FIRST"
        generated :+ ("fzcanary_missing_cast" -> (c, c))
      } else generated
    var failed = 0
    queries.foreach { case (name, (sparkSql, _)) =>
      try spark.sql(sparkSql).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(
          s"[fuzz] $name failed on Spark: ${e.getMessage}\n$sparkSql")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      queries.map { case (k, (_, duckSql)) => s"${q(k)}: ${q(duckSql)}" }
        .mkString("{", ",", "}"))
    println(s"""{"fuzz_queries":$count,"spark_failures":$failed,"seed":$seed}""")
    spark.stop()
  }
}
