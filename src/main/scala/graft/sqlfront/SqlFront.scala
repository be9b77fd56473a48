package graft.sqlfront

import org.apache.spark.sql.types._

/** Multi-statement splitter (reference StatementSplitter.java +
  * QueryService.java:85-141): split on top-level ';', honoring single
  * quotes ('' escape), double-quoted identifiers, line (--) and block
  * comments. */
object StatementSplitter {
  def split(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inS = false; var inD = false; var inLine = false; var inBlock = false
    // PG dollar-quoted body: `$$ … $$` or tagged `$tag$ … $tag$` (e.g. DO
    // blocks, function bodies). Non-null = the exact closing delimiter.
    var dollarClose: String = null
    // `$tag$` opener at position p, or null ($ alone is not an opener)
    def dollarOpenAt(p: Int): String = {
      if (sql.charAt(p) != '$') return null
      var j = p + 1
      while (j < sql.length && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j += 1
      if (j < sql.length && sql.charAt(j) == '$') sql.substring(p, j + 1) else null
    }
    while (i < sql.length) {
      val c = sql.charAt(i)
      val next = if (i + 1 < sql.length) sql.charAt(i + 1) else ' '
      if (inLine) { if (c == '\n') { inLine = false; cur += c } ; i += 1 }
      else if (inBlock) { if (c == '*' && next == '/') { inBlock = false; i += 2 } else i += 1 }
      else if (dollarClose != null) {
        if (c == '$' && sql.startsWith(dollarClose, i)) {
          cur ++= dollarClose; i += dollarClose.length; dollarClose = null
        } else { cur += c; i += 1 }
      }
      else if (inS) { cur += c; if (c == '\'') { if (next == '\'') { cur += next; i += 1 } else inS = false }; i += 1 }
      else if (inD) { cur += c; if (c == '"') inD = false; i += 1 }
      else c match {
        case '-' if next == '-' => inLine = true; i += 2
        case '$' if dollarOpenAt(i) != null =>
          val tag = dollarOpenAt(i)
          dollarClose = tag; cur ++= tag; i += tag.length
        case '/' if next == '*' => inBlock = true; i += 2
        case '\'' => inS = true; cur += c; i += 1
        case '"' => inD = true; cur += c; i += 1
        case ';' =>
          val t = cur.toString.trim; if (t.nonEmpty) out += t; cur.clear(); i += 1
        case _ => cur += c; i += 1
      }
    }
    val t = cur.toString.trim
    if (t.nonEmpty) out += t
    out.result()
  }
}

/** PostgreSQL-syntax pre-rewrite (SURVEY §4.3.1): a deterministic string
  * rewriter run before `spark.sql`, not a Catalyst rule — exactly the
  * compatibility shim layer the reference implements inside its executors
  * (reference kv/KvQueryExecutor.java:3159-3211 for JSON operators).
  *
  * Handled: `->` / `->>` (key and array-index), `#>` / `#>>` path
  * operators → `get_json_object`, and `expr::type` casts → CAST(). The
  * `||` concat and standard functions need no rewrite (Spark-native).
  */
object PgRewrite {
  // LHS of a JSON operator: a column reference or a string literal
  private val jsonLhs = """([\w\.]+|'(?:[^']|'')*')"""
  private val path = (jsonLhs + """\s*#>>?\s*'\{([^}]*)\}'""").r
  private val keyOnIdent = (jsonLhs + """\s*->(>?)\s*'([^']+)'""").r
  private val idxOnIdent = (jsonLhs + """\s*->(>?)\s*(\d+)""").r
  private val keyOnGjo = """get_json_object\(([\w\.]+),\s*'(\$[^']*)'\)\s*->(>?)\s*'([^']+)'""".r
  private val idxOnGjo = """get_json_object\(([\w\.]+),\s*'(\$[^']*)'\)\s*->(>?)\s*(\d+)""".r
  private val regexOp = """([\w\.]+)\s*(!?)~(\*?)\s*('(?:[^']|'')*')""".r
  // literal operand is escape-aware ('' stays inside the literal) so
  // `'it''s'::text` captures the WHOLE literal, not a tail slice of it
  private val castSimple = """((?:\w+\.)*\w+|'(?:[^']|'')*')::(\w+(?:\s+precision)?(?:\(\d+(?:,\d+)?\))?)""".r
  private val castType = """\w+(?:\s+precision)?(?:\(\d+(?:,\d+)?\))?""".r

  /** Spans [start, end) of single-quoted literals ('' escape honored)
    * AND backtick-quoted identifiers (`` escape honored). The
    * quoted-identifier pass runs FIRST in the pipeline, so by the time
    * any later rewrite scans, keyword-like text from a PG double-quoted
    * identifier (`"FOR UPDATE"`, `"unnest(x)"`) lives between backticks
    * — both span kinds must be opaque to every rewrite or identifier
    * content gets rewritten as syntax. */
  private def literalSpans(s: String): Array[(Int, Int)] = {
    val spans = Array.newBuilder[(Int, Int)]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '`') {
        val start = i; i += 1
        var done = false
        while (i < s.length && !done) {
          if (s.charAt(i) == c) {
            if (i + 1 < s.length && s.charAt(i + 1) == c) i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
        spans += ((start, i))
      } else i += 1
    }
    spans.result()
  }

  /** Rewrite `expr::type` → `CAST(expr AS type)`. Parenthesized operands
    * (`(a+b)::int`, `f(x)::int`) need a paren-balanced backward scan — a
    * regex alternative on `)` would capture only the closer and emit
    * invalid SQL. String literals are opaque throughout: a `::` inside a
    * literal is content, and the backward scan steps OVER literals so a
    * `(` inside one (e.g. `split_part(x, '(', 1)::int`) can't unbalance
    * it. Inner `::` inside a captured operand are picked up by later
    * iterations / the simple-operand pass. */
  private def rewriteCasts(sql: String): String = {
    var out = sql
    var i = out.indexOf("::")
    while (i >= 0) {
      val spans = literalSpans(out)
      // `::` strictly inside a literal is content, not a cast
      val inLiteral = spans.exists { case (a, b) => i > a && i < b - 1 }
      if (!inLiteral && i > 0 && out.charAt(i - 1) == ')') {
        // scan back to the balanced '(' and any attached function name,
        // hopping over whole literals
        var depth = 0; var j = i - 1; var found = -1
        while (j >= 0 && found < 0) {
          val span = spans.find { case (a, b) => j >= a && j < b }
          if (span.isDefined) j = span.get._1 - 1
          else {
            out.charAt(j) match {
              case ')' => depth += 1
              case '(' => depth -= 1; if (depth == 0) found = j
              case _ =>
            }
            if (found < 0) j -= 1
          }
        }
        val next = castType.findPrefixMatchOf(out.substring(i + 2)) match {
          case Some(m) if found >= 0 =>
            var k = found - 1
            while (k >= 0 && (out.charAt(k).isLetterOrDigit ||
              out.charAt(k) == '_' || out.charAt(k) == '.')) k -= 1
            val start = k + 1
            val operand = out.substring(start, i)
            out = out.substring(0, start) +
              s"CAST($operand AS ${m.matched})" + out.substring(i + 2 + m.end)
            start
          case _ => i + 2
        }
        i = out.indexOf("::", next)
      } else i = out.indexOf("::", i + 2)
    }
    val spans = literalSpans(out)
    castSimple.replaceSomeIn(out, m => {
      val cp = m.end(1) // position of the "::"
      if (spans.exists { case (a, b) => cp > a && cp < b - 1 }) None
      else Some(java.util.regex.Matcher.quoteReplacement(
        s"CAST(${m.group(1)} AS ${m.group(2)})"))
    })
  }

  /** True when `pos` falls strictly inside a quoted literal — operator
    * text stored IN a string (e.g. an inserted TEXT value that happens to
    * contain `col ~ 'pat'` or `a->>'k'`) is content, never syntax. The
    * operand regexes themselves may legitimately START on a literal
    * (literal LHS), so gating keys on the OPERATOR's position. */
  private def inLiteral(spans: Array[(Int, Int)], pos: Int): Boolean =
    spans.exists { case (a, b) => pos > a && pos < b - 1 }

  /** PG aggregate-internal ORDER BY (`array_agg(x ORDER BY y [DESC])`,
    * `string_agg(x, d ORDER BY y)`) → Spark spellings. Spark parses the
    * standard `WITHIN GROUP` form natively (listagg / string_agg /
    * percentile_cont / mode), but NOT the PG inside-the-args form, which
    * is what PG users and pg_dump actually emit. Rewrites:
    *   string_agg(x, d ORDER BY k)   → string_agg(x, d) WITHIN GROUP (ORDER BY k)
    *   array_agg(x ORDER BY x [ASC]) → sort_array(array_agg(x))
    *   array_agg(x ORDER BY x DESC)  → sort_array(array_agg(x), false)
    *   array_agg(x ORDER BY k, …)    → transform(array_sort(array_agg(struct(k AS _o1, …, x AS _v))), s -> s._v)
    * (struct natural ordering sorts by the key fields first, then the
    * value — deterministic under ties; all-DESC wraps in reverse(); mixed
    * ASC/DESC directions are rejected rather than silently mis-sorted.)
    */
  private def rewriteAggOrderBy(sql: String): String = {
    val fnRe = """(?i)\b(array_agg|string_agg)\s*\(""".r
    val spans = literalSpans(sql)
    fnRe.findAllMatchIn(sql).toSeq.reverseIterator.foldLeft(sql) { (s, m) =>
      if (inLiteral(spans, m.start)) s
      else {
        // balanced scan to the close paren, stepping over literals
        val open = m.end - 1
        var depth = 0; var j = open; var close = -1
        while (j < s.length && close < 0) {
          val span = literalSpans(s).find { case (a, b) => j >= a && j < b }
          if (span.isDefined) j = span.get._2
          else {
            s.charAt(j) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = j
              case _ =>
            }
            if (close < 0) j += 1
          }
        }
        val args = s.substring(open + 1, close)
        // top-level " ORDER BY " split (outside nested parens/literals)
        val ob = {
          val re = """(?i)\bORDER\s+BY\b""".r
          val inner = literalSpans(args)
          re.findAllMatchIn(args).find { mm =>
            !inner.exists { case (a, b) => mm.start > a && mm.start < b } &&
              args.substring(0, mm.start).count(_ == '(') ==
              args.substring(0, mm.start).count(_ == ')')
          }
        }
        ob match {
          case None => s
          case Some(mm) =>
            val aggArgs = args.substring(0, mm.start).trim
            val orderBy = args.substring(mm.end).trim
            val fn = m.group(1).toLowerCase
            val repl =
              if (fn == "string_agg")
                s"string_agg($aggArgs) WITHIN GROUP (ORDER BY $orderBy)"
              else {
                val keys = orderBy.split(",").map(_.trim).filter(_.nonEmpty)
                def dir(k: String): (String, Boolean) = {
                  val u = k.toUpperCase
                  if (u.endsWith(" DESC")) (k.dropRight(5).trim, true)
                  else if (u.endsWith(" ASC")) (k.dropRight(4).trim, false)
                  else (k, false)
                }
                val parsed = keys.map(dir)
                val descs = parsed.map(_._2).distinct
                if (descs.length > 1) throw new IllegalArgumentException(
                  s"array_agg ORDER BY with mixed ASC/DESC directions is not supported: $orderBy")
                val desc = descs.headOption.getOrElse(false)
                val exprs = parsed.map(_._1)
                if (exprs.length == 1 && exprs.head.equalsIgnoreCase(aggArgs))
                  if (desc) s"sort_array(array_agg($aggArgs), false)"
                  else s"sort_array(array_agg($aggArgs))"
                else {
                  val keyFields = exprs.zipWithIndex
                    .map { case (k, i) => s"$k AS _o${i + 1}" }.mkString(", ")
                  val sorted = s"array_sort(array_agg(struct($keyFields, $aggArgs AS _v)))"
                  val ordered = if (desc) s"reverse($sorted)" else sorted
                  s"transform($ordered, s -> s._v)"
                }
              }
            s.substring(0, m.start) + repl + s.substring(close + 1)
        }
      }
    }
  }

  /** ANSI/PG row-limit spellings Spark's parser lacks (the reference
    * grammar has LIMIT/OFFSET only — sql/parser/SqlParser.java — but PG
    * clients and ORMs emit the standard form):
    *   OFFSET n [ROW[S]] FETCH {FIRST|NEXT} [m] ROW[S] ONLY → LIMIT m OFFSET n
    *   FETCH {FIRST|NEXT} [m] ROW[S] ONLY                   → LIMIT m  (m defaults to 1)
    *   OFFSET n ROW[S]                                      → OFFSET n
    * Spark's grammar requires LIMIT before OFFSET, so the combined form
    * swaps the clauses. FETCH … WITH TIES has no LIMIT twin and is
    * rejected loudly rather than silently dropping the tie rows. */
  private def rewriteFetchFirst(sql: String): String = {
    val u = sql.toUpperCase
    if (!u.contains("FETCH") && !u.contains("OFFSET")) return sql
    def gate(re: scala.util.matching.Regex, s: String)(
        repl: scala.util.matching.Regex.Match => String): String = {
      val spans = literalSpans(s)
      re.replaceSomeIn(s, m => if (inLiteral(spans, m.start)) None
        else Some(java.util.regex.Matcher.quoteReplacement(repl(m))))
    }
    val ties = """(?i)\bFETCH\s+(?:FIRST|NEXT)\s+(?:\d+\s+)?ROWS?\s+WITH\s+TIES""".r
    val spans0 = literalSpans(sql)
    ties.findFirstMatchIn(sql).foreach { m =>
      if (!inLiteral(spans0, m.start)) throw new IllegalArgumentException(
        "FETCH ... WITH TIES is not supported; filter on a rank() window instead")
    }
    var s = gate("""(?i)\bOFFSET\s+(\d+)\s+(?:ROWS?\s+)?FETCH\s+(?:FIRST|NEXT)\s+(?:(\d+)\s+)?ROWS?\s+ONLY""".r, sql)(
      m => s"LIMIT ${Option(m.group(2)).getOrElse("1")} OFFSET ${m.group(1)}")
    s = gate("""(?i)\bFETCH\s+(?:FIRST|NEXT)\s+(?:(\d+)\s+)?ROWS?\s+ONLY""".r, s)(
      m => s"LIMIT ${Option(m.group(1)).getOrElse("1")}")
    gate("""(?i)\b(OFFSET\s+\d+)\s+ROWS?\b""".r, s)(m => m.group(1))
  }

  /** PG `TABLESAMPLE {BERNOULLI|SYSTEM}(p) [REPEATABLE(seed)]` →
    * Spark's `TABLESAMPLE (p PERCENT) [REPEATABLE (seed)]`. Both map to
    * Spark's Bernoulli row sampler: PG's BERNOULLI is row-level (exact
    * match); PG's SYSTEM is page-level, which has no Spark analogue —
    * row-level is the closest semantic (a superset of what SYSTEM
    * guarantees). REPEATABLE keeps PG's contract — determinism across
    * runs for the same seed on the same data — via Spark's seeded
    * sampler; without it both engines are free-running random. */
  private def rewriteTableSample(sql: String): String = {
    if (!sql.toUpperCase.contains("TABLESAMPLE")) return sql
    val re = ("""(?i)\bTABLESAMPLE\s+(BERNOULLI|SYSTEM)\s*\(\s*([\d.]+)\s*\)""" +
      """(?:\s*REPEATABLE\s*\(\s*(\d+)\s*\))?""").r
    val spans = literalSpans(sql)
    re.replaceSomeIn(sql, m =>
      if (inLiteral(spans, m.start)) None
      else Some(java.util.regex.Matcher.quoteReplacement(
        s"TABLESAMPLE (${m.group(2)} PERCENT)" +
          Option(m.group(3)).fold("")(seed => s" REPEATABLE ($seed)"))))
  }

  /** PG set-returning `generate_series(a, b[, step])` in FROM position →
    * Spark's `explode(sequence(a, b[, step]))` table-valued function
    * (integer series; both ends inclusive on both engines). Alias
    * semantics follow PG: `AS t(n)` exposes column n; a bare alias `g`
    * names BOTH the relation and the column; no alias exposes a column
    * named generate_series. Only FROM-clause positions rewrite — after
    * FROM/JOIN, or a FROM-list comma at top paren depth (an
    * argument-position call is always inside at least one paren and is
    * left untouched). */
  private def rewriteGenerateSeries(sql: String): String = {
    if (!sql.toLowerCase.contains("generate_series")) return sql
    val re = """(?i)(\bFROM|\bJOIN|,)(\s*)generate_series\s*\(""".r
    val kw = Set("WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "OFFSET",
      "FETCH", "UNION", "INTERSECT", "EXCEPT", "JOIN", "ON", "USING",
      "CROSS", "INNER", "LEFT", "RIGHT", "FULL", "NATURAL", "WINDOW",
      "QUALIFY", "RETURNING")
    var out = sql
    var progress = true
    while (progress) {
      progress = false
      val spans = literalSpans(out)
      val next = re.findAllMatchIn(out).find { mm =>
        if (inLiteral(spans, mm.start)) false
        else if (mm.group(1) != ",") true
        else { // a FROM-list comma sits at paren depth 0; args commas don't
          var d = 0; var i = 0
          while (i < mm.start) {
            if (!inLiteral(spans, i)) {
              val c = out.charAt(i)
              if (c == '(') d += 1 else if (c == ')') d -= 1
            }
            i += 1
          }
          d == 0
        }
      }
      next.foreach { mm =>
        val open = mm.end - 1
        var d = 0; var j = open; var close = -1
        while (j < out.length && close < 0) {
          val span = spans.find { case (a, b) => j >= a && j < b }
          if (span.isDefined) j = span.get._2
          else {
            out.charAt(j) match {
              case '(' => d += 1
              case ')' => d -= 1; if (d == 0) close = j
              case _ =>
            }
            if (close < 0) j += 1
          }
        }
        if (close < 0) throw new IllegalArgumentException(
          s"unbalanced parens in generate_series call: $out")
        val args = out.substring(open + 1, close)
        val tail = out.substring(close + 1)
        val aliasRe = """(?is)^\s*(?:AS\s+)?([A-Za-z_]\w*)(\s*\(\s*([A-Za-z_]\w*)\s*\))?""".r
        val (alias, consumed) = aliasRe.findFirstMatchIn(tail) match {
          case Some(am) if !kw.contains(am.group(1).toUpperCase) =>
            val rel = am.group(1)
            (s" AS $rel(${Option(am.group(3)).getOrElse(rel)})", am.end)
          case _ => (" AS generate_series(generate_series)", 0)
        }
        out = out.substring(0, mm.start) + mm.group(1) + mm.group(2) +
          s"explode(sequence($args))" + alias + tail.substring(consumed)
        progress = true
      }
    }
    out
  }

  /** PG `expr [NOT] SIMILAR TO 'pattern'` → anchored RLIKE. SQL-regex →
    * Java-regex conversion: `%` → `.*`, `_` → `.`, literal `.` escaped;
    * regex operators that SIMILAR TO shares with POSIX (`| * + ? () []
    * {}`) pass through unchanged. Spark has no SIMILAR TO at all;
    * literal patterns only (a computed pattern stays untouched and fails
    * loudly in Spark's parser rather than silently matching wrong). */
  private def rewriteSimilarTo(sql: String): String = {
    if (!sql.toUpperCase.contains("SIMILAR")) return sql
    val re = """([\w\.]+)\s+(NOT\s+)?(?i:SIMILAR)\s+(?i:TO)\s+('(?:[^']|'')*')""".r
    val spans = literalSpans(sql)
    re.replaceSomeIn(sql, m => {
      val opPos = m.start(0) + m.group(1).length
      if (inLiteral(spans, opPos)) None
      else {
        val body = m.group(3).drop(1).dropRight(1)
        val conv = new StringBuilder("^(?:")
        var i = 0
        while (i < body.length) {
          body.charAt(i) match {
            case '\\' if i + 1 < body.length => // escaped char passes through
              conv += '\\' += body.charAt(i + 1); i += 1
            case '%' => conv ++= ".*"
            case '_' => conv += '.'
            case '.' => conv ++= "\\."
            case c => conv += c
          }
          i += 1
        }
        conv ++= ")$"
        val neg = m.group(2) != null
        val e = s"${m.group(1)} RLIKE '${conv.toString}'"
        Some(java.util.regex.Matcher.quoteReplacement(
          if (neg) s"NOT ($e)" else e))
      }
    })
  }

  /** PG `ARRAY[e1, e2, …]` constructor → Spark `array(e1, e2, …)`
    * (reference sql/parser has no array syntax at all; SURVEY §2.9 maps
    * `type[]` columns through TypeMap). Balanced-bracket scan so nested
    * constructors (`ARRAY[ARRAY[1],ARRAY[2]]`) and bracketed content
    * resolve inside-out across loop iterations; subscript brackets
    * (`arr[1]`) never match because they don't follow the ARRAY keyword. */
  private def rewriteArrayLiteral(sql: String): String = {
    if (!sql.toUpperCase.contains("ARRAY")) return sql
    val re = """(?i)\bARRAY\s*\[""".r
    var out = sql
    var progress = true
    while (progress) {
      progress = false
      val spans = literalSpans(out)
      re.findAllMatchIn(out).find(mm => !inLiteral(spans, mm.start)).foreach { mm =>
        val open = mm.end - 1
        var d = 0; var j = open; var close = -1
        while (j < out.length && close < 0) {
          val span = spans.find { case (a, b) => j >= a && j < b }
          if (span.isDefined) j = span.get._2
          else {
            out.charAt(j) match {
              case '[' => d += 1
              case ']' => d -= 1; if (d == 0) close = j
              case _ =>
            }
            if (close < 0) j += 1
          }
        }
        if (close < 0) throw new IllegalArgumentException(
          s"unbalanced brackets in ARRAY[...] constructor: $out")
        out = out.substring(0, mm.start) +
          s"array(${out.substring(open + 1, close)})" + out.substring(close + 1)
        progress = true
      }
    }
    out
  }

  /** PG quantified comparisons (reference grammar: none; PG clients emit
    * them constantly, e.g. JDBC's `setArray` idiom `x = ANY(?)`):
    *   lhs =  ANY(SELECT …)  → lhs IN (SELECT …)
    *   lhs <> ALL(SELECT …)  → lhs NOT IN (SELECT …)
    *   lhs =  ANY(array-expr) → array_contains(array-expr, lhs)
    *   lhs <> ALL(array-expr) → NOT array_contains(array-expr, lhs)
    * The subquery/array split keys on the content's leading keyword.
    * `= ALL` / `<> ANY` have no IN/array_contains twin and are rejected
    * loudly rather than silently inverted. */
  private def rewriteAnyAll(sql: String): String = {
    val u = sql.toUpperCase
    if (!u.contains("ANY") && !u.contains("ALL")) return sql
    val re = ("""([\w\.]+|'(?:[^']|'')*')\s*(=|<>|!=)\s*""" +
      """((?i:ANY)|(?i:ALL))\s*\(""").r
    var out = sql
    var progress = true
    while (progress) {
      progress = false
      val spans = literalSpans(out)
      re.findAllMatchIn(out).find(mm => !inLiteral(spans, mm.end(2) - 1)).foreach { mm =>
        val open = mm.end - 1
        var d = 0; var j = open; var close = -1
        while (j < out.length && close < 0) {
          val span = spans.find { case (a, b) => j >= a && j < b }
          if (span.isDefined) j = span.get._2
          else {
            out.charAt(j) match {
              case '(' => d += 1
              case ')' => d -= 1; if (d == 0) close = j
              case _ =>
            }
            if (close < 0) j += 1
          }
        }
        if (close < 0) throw new IllegalArgumentException(
          s"unbalanced parens in ANY/ALL: $out")
        val lhs = mm.group(1)
        val op = mm.group(2)
        val quant = mm.group(3).toUpperCase
        val content = out.substring(open + 1, close).trim
        val isSubquery = """(?i)^(SELECT|WITH|VALUES)\b""".r.findFirstIn(content).isDefined
        val repl = (op, quant) match {
          case ("=", "ANY") if isSubquery => s"$lhs IN ($content)"
          case ("<>" | "!=", "ALL") if isSubquery => s"$lhs NOT IN ($content)"
          case ("=", "ANY") => s"array_contains($content, $lhs)"
          case ("<>" | "!=", "ALL") => s"NOT array_contains($content, $lhs)"
          case _ => throw new IllegalArgumentException(
            s"$op $quant(...) has no IN/array_contains equivalent; " +
              "rewrite with EXISTS or an aggregate")
        }
        out = out.substring(0, mm.start) + repl + out.substring(close + 1)
        progress = true
      }
    }
    out
  }

  /** PG `SELECT DISTINCT ON (k1, …) sel FROM body ORDER BY k1, …, tie` —
    * keep the FIRST row of each key group in ORDER BY order, the
    * latest-per-key idiom (the reference grammar has plain DISTINCT only;
    * SURVEY §2.4). Rewritten to the Spark-native window equivalent:
    *   SELECT sel FROM (SELECT *, row_number() OVER (PARTITION BY k1, …
    *     ORDER BY obys) AS __graft_don FROM body) __graft_d
    *   WHERE __graft_don = 1 ORDER BY obys [limit-tail]
    * Scope — violations are rejected loudly, never silently wrong:
    * the DISTINCT ON SELECT must sit at paren depth 0 (a CTE prefix is
    * fine — CTE bodies close their parens before the main SELECT), must
    * carry an ORDER BY (PG's ORDER-BY-less form returns arbitrary rows —
    * nondeterminism this engine refuses), and the body must have no
    * top-level GROUP BY (`SELECT *` under the window would change the
    * aggregate's shape). The window and outer ORDER BY see base/output
    * columns exactly as PG resolves them. */
  private def rewriteDistinctOn(sql: String): String = {
    val re = """(?i)\bSELECT\s+DISTINCT\s+ON\s*\(""".r
    val spans = literalSpans(sql)
    val m = re.findAllMatchIn(sql).find(mm => !inLiteral(spans, mm.start))
      .getOrElse(return sql)
    // paren depth at the match — CTE prefixes close to 0, subqueries don't
    var depth = 0; var i = 0
    while (i < m.start) {
      if (!inLiteral(spans, i)) {
        val c = sql.charAt(i)
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
      }
      i += 1
    }
    if (depth != 0) throw new IllegalArgumentException(
      "DISTINCT ON in a subquery is not supported; hoist it into a CTE")
    // balanced key list
    val open = m.end - 1
    var d = 0; var j = open; var close = -1
    while (j < sql.length && close < 0) {
      val span = spans.find { case (a, b) => j >= a && j < b }
      if (span.isDefined) j = span.get._2
      else {
        sql.charAt(j) match {
          case '(' => d += 1
          case ')' => d -= 1; if (d == 0) close = j
          case _ =>
        }
        if (close < 0) j += 1
      }
    }
    if (close < 0) throw new IllegalArgumentException(
      s"unbalanced parens in DISTINCT ON: $sql")
    val keys = sql.substring(open + 1, close)
    // top-level keyword scan relative to this SELECT's depth
    def topLevel(from: Int, re2: scala.util.matching.Regex): Option[Int] =
      re2.findAllMatchIn(sql).filter(x => x.start >= from && !inLiteral(spans, x.start))
        .find { x =>
          var dd = 0; var k = close + 1
          while (k < x.start) {
            if (!inLiteral(spans, k)) {
              val c = sql.charAt(k)
              if (c == '(') dd += 1 else if (c == ')') dd -= 1
            }
            k += 1
          }
          dd == 0
        }.map(_.start)
    val fromPos = topLevel(close + 1, """(?i)\bFROM\b""".r).getOrElse(
      throw new IllegalArgumentException("DISTINCT ON requires a FROM clause"))
    val orderPos = topLevel(fromPos, """(?i)\bORDER\s+BY\b""".r).getOrElse(
      throw new IllegalArgumentException(
        "DISTINCT ON without ORDER BY returns arbitrary rows; add an ORDER BY " +
          "leading with the DISTINCT ON expressions"))
    if (topLevel(fromPos, """(?i)\bGROUP\s+BY\b""".r).exists(_ < orderPos))
      throw new IllegalArgumentException(
        "DISTINCT ON over a grouped query is not supported; aggregate in a CTE first")
    val sel = sql.substring(close + 1, fromPos).trim
    val body = sql.substring(fromPos + 4, orderPos).trim
    val afterOrder = sql.substring(orderPos).replaceFirst("""(?is)^ORDER\s+BY""", "")
    val limPos = topLevel(orderPos, """(?i)\b(?:LIMIT|OFFSET|FETCH)\b""".r)
    val (obys, tail) = limPos match {
      case Some(p) =>
        (sql.substring(orderPos, p).replaceFirst("""(?is)^ORDER\s+BY""", "").trim,
          sql.substring(p))
      case None => (afterOrder.trim, "")
    }
    sql.substring(0, m.start) +
      s"SELECT $sel FROM (SELECT *, row_number() OVER (PARTITION BY $keys " +
      s"ORDER BY $obys) AS __graft_don FROM $body) __graft_d " +
      s"WHERE __graft_don = 1 ORDER BY $obys" + (if (tail.isEmpty) "" else s" $tail")
  }

  /** Balanced close-paren scan from the '(' at `open`, stepping over
    * string literals. Returns the index of the matching ')' or -1. */
  private def balancedClose(s: String, open: Int): Int = {
    val spans = literalSpans(s)
    var d = 0; var j = open; var close = -1
    while (j < s.length && close < 0) {
      val span = spans.find { case (a, b) => j >= a && j < b }
      if (span.isDefined) j = span.get._2
      else {
        s.charAt(j) match {
          case '(' => d += 1
          case ')' => d -= 1; if (d == 0) close = j
          case _ =>
        }
        if (close < 0) j += 1
      }
    }
    close
  }

  /** Split an argument list on top-level commas (nested parens and string
    * literals are opaque). */
  private def topSplitArgs(args: String): Seq[String] = {
    val spans = literalSpans(args)
    val out = Seq.newBuilder[String]; val cur = new StringBuilder
    var d = 0; var i = 0
    while (i < args.length) {
      val span = spans.find { case (a, b) => i >= a && i < b }
      if (span.isDefined) { cur ++= args.substring(span.get._1, span.get._2); i = span.get._2 }
      else {
        val c = args.charAt(i)
        if (c == '(') d += 1 else if (c == ')') d -= 1
        if (c == ',' && d == 0) { out += cur.toString.trim; cur.clear() }
        else cur += c
        i += 1
      }
    }
    out += cur.toString.trim
    out.result()
  }

  /** Rewrite every non-literal call of `fname` whose args `repl` accepts.
    * `repl` gets the top-level-split args and returns the replacement
    * expression, or None to leave that call unchanged (e.g. a form Spark
    * parses natively). The scan restarts after each rewrite so nested
    * calls resolve; replacements must not re-introduce a qualifying
    * call of the same name. */
  private def rewriteCalls(sql: String, fname: String)(
      repl: Seq[String] => Option[String]): String = {
    if (!sql.toLowerCase.contains(fname.toLowerCase)) return sql
    val re = ("""(?i)\b""" + fname + """\s*\(""").r
    var out = sql
    var progress = true
    val skipped = scala.collection.mutable.Set[Int]()
    while (progress) {
      progress = false
      val spans = literalSpans(out)
      re.findAllMatchIn(out)
        .find(mm => !inLiteral(spans, mm.start) && !skipped.contains(mm.start))
        .foreach { mm =>
          val open = mm.end - 1
          val close = balancedClose(out, open)
          if (close < 0) throw new IllegalArgumentException(
            s"unbalanced parens in $fname call: $out")
          repl(topSplitArgs(out.substring(open + 1, close))) match {
            case Some(r) =>
              out = out.substring(0, mm.start) + r + out.substring(close + 1)
              skipped.clear() // positions shifted; re-scan from scratch
              progress = true
            case None =>
              skipped += mm.start // native form: leave it, look past it
              progress = true
          }
        }
    }
    out
  }

  /** A string literal as a Java-regex that matches it literally, spelled
    * as a Spark SQL literal: 'a.b' → '\\Qa.b\\E' (backslash doubled
    * because Spark string literals are escape-processed). */
  private def literalAsRegex(lit: String): String = {
    require(lit.length >= 2 && lit.head == '\'' && lit.last == '\'',
      s"expected a string literal delimiter, got: $lit")
    val body = lit.drop(1).dropRight(1)
    require(!body.contains("\\Q") && !body.contains("\\E"),
      s"delimiter containing \\Q/\\E is not supported: $lit")
    "'\\\\Q" + body + "\\\\E'"
  }

  private def isStringLiteral(s: String): Boolean =
    s.length >= 2 && s.head == '\'' && s.last == '\'' &&
      literalSpans(s).exists { case (a, b) => a == 0 && b == s.length }

  /** PG → Spark format-pattern translation for to_char (longest token
    * first; unknown alphabetic tokens fail loudly rather than silently
    * formatting wrong — Java pattern letters and PG pattern letters
    * overlap with different meanings). */
  private def translatePgDateFormat(fmt: String): String = {
    val tokens = Seq(
      "HH24" -> "HH", "HH12" -> "hh", "YYYY" -> "yyyy", "US" -> "SSSSSS",
      "MS" -> "SSS", "YY" -> "yy", "MM" -> "MM", "DD" -> "dd",
      "HH" -> "hh", "MI" -> "mm", "SS" -> "ss", "AM" -> "a", "PM" -> "a")
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c.isLetter) {
        tokens.find { case (pg, _) => fmt.regionMatches(true, i, pg, 0, pg.length) } match {
          case Some((pg, spark)) => out ++= spark; i += pg.length
          case None => throw new IllegalArgumentException(
            s"unsupported to_char pattern token at '${fmt.substring(i)}' in '$fmt'")
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** PG set-returning and string-function spellings Spark lacks
    * (reference grammar has none of these; PG clients emit them —
    * SURVEY §2.9):
    *   unnest(e) WITH ORDINALITY AS t(v, o) → (SELECT col AS v, pos+1 AS o
    *     FROM posexplode(e)) AS t          [non-correlated FROM position]
    *   unnest(e)                  → explode(e)
    *   string_to_array(x, 'd')    → split(x, '\\Qd\\E', -1)
    *   string_to_table(x, 'd')    → explode(split(x, '\\Qd\\E', -1))
    *   regexp_split_to_array/table(x, p) → split(x, p, -1) [/ explode(…)]
    *   strpos(s, sub)             → instr(s, sub)
    *   substring(x FROM 'regex')  → regexp_extract(x, 'regex', 0|1)
    *     (group 1 when the pattern has a capture group, PG's rule;
    *     numeric FROM/FOR forms are Spark-native and pass through)
    *   to_char(e, 'YYYY…')        → date_format(e, translated pattern)
    *     (numeric to_char masks are Spark-native and pass through)
    *   extract(epoch FROM e) / date_part('epoch', e)
    *     → (CAST(unix_micros(CAST(e AS TIMESTAMP)) AS DOUBLE) / 1000000)
    *     (other fields are Spark-native) */
  private def rewritePgFunctions(sql: String): String = {
    var s = sql
    // unnest … WITH ORDINALITY first (consumes the unnest call); the
    // plain-name map below would otherwise strand the ordinality tail
    if (s.toLowerCase.contains("ordinality")) {
      val re = """(?i)\bunnest\s*\(""".r
      var progress = true
      while (progress) {
        progress = false
        val spans = literalSpans(s)
        re.findAllMatchIn(s).find { mm =>
          !inLiteral(spans, mm.start) && {
            val close = balancedClose(s, mm.end - 1)
            close > 0 && s.substring(close + 1).matches("""(?is)\s*WITH\s+ORDINALITY\b.*""")
          }
        }.foreach { mm =>
          val close = balancedClose(s, mm.end - 1)
          val e = s.substring(mm.end, close)
          val tail = s.substring(close + 1)
          val aliasRe =
            """(?is)^\s*WITH\s+ORDINALITY\s+(?:AS\s+)?(\w+)\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)""".r
          aliasRe.findFirstMatchIn(tail) match {
            case Some(am) =>
              s = s.substring(0, mm.start) +
                s"(SELECT col AS ${am.group(2)}, pos + 1 AS ${am.group(3)} " +
                s"FROM posexplode($e)) AS ${am.group(1)}" +
                tail.substring(am.end)
              progress = true
            case None => throw new IllegalArgumentException(
              "unnest(...) WITH ORDINALITY requires an alias with a column " +
                "list: AS t(value, ordinality)")
          }
        }
      }
    }
    s = rewriteCalls(s, "unnest")(args => Some(s"explode(${args.mkString(", ")})"))
    s = rewriteCalls(s, "string_to_array") {
      case Seq(x, d) if isStringLiteral(d) => Some(s"split($x, ${literalAsRegex(d)}, -1)")
      case args => throw new IllegalArgumentException(
        s"string_to_array supports (expr, 'literal-delimiter') only, got ${args.size} arg(s)")
    }
    s = rewriteCalls(s, "string_to_table") {
      case Seq(x, d) if isStringLiteral(d) =>
        Some(s"explode(split($x, ${literalAsRegex(d)}, -1))")
      case args => throw new IllegalArgumentException(
        s"string_to_table supports (expr, 'literal-delimiter') only, got ${args.size} arg(s)")
    }
    s = rewriteCalls(s, "regexp_split_to_array") {
      case Seq(x, p) => Some(s"split($x, $p, -1)")
      case args => throw new IllegalArgumentException(
        s"regexp_split_to_array takes (expr, pattern), got ${args.size} arg(s)")
    }
    s = rewriteCalls(s, "regexp_split_to_table") {
      case Seq(x, p) => Some(s"explode(split($x, $p, -1))")
      case args => throw new IllegalArgumentException(
        s"regexp_split_to_table takes (expr, pattern), got ${args.size} arg(s)")
    }
    s = rewriteCalls(s, "strpos") {
      case Seq(a, b) => Some(s"instr($a, $b)")
      case args => throw new IllegalArgumentException(
        s"strpos takes (string, substring), got ${args.size} arg(s)")
    }
    // substring(x FROM 'regex') — single arg after top-split (FROM is not
    // a comma); numeric FROM/FOR and comma forms pass through untouched
    s = rewriteCalls(s, "substring") {
      case Seq(one) =>
        val m = """(?is)^(.*\S)\s+FROM\s+('(?:[^']|'')*')$""".r.findFirstMatchIn(one)
        m.flatMap { mm =>
          val pat = mm.group(2)
          // PG: the whole match unless the pattern has a capture group
          val body = pat.drop(1).dropRight(1)
          val hasGroup = {
            var i = 0; var found = false
            while (i < body.length && !found) {
              if (body.charAt(i) == '\\') i += 2
              else {
                if (body.charAt(i) == '(' &&
                  !body.startsWith("(?:", i) && !body.startsWith("(?=", i) &&
                  !body.startsWith("(?!", i)) found = true
                i += 1
              }
            }
            found
          }
          Some(s"regexp_extract(${mm.group(1)}, $pat, ${if (hasGroup) 1 else 0})")
        }
      case _ => None
    }
    s = rewriteCalls(s, "to_char") {
      case Seq(e, f) if isStringLiteral(f) &&
        """(?i)(YYYY|YY|HH24|HH12|MI|SS|DD|AM|PM)""".r
          .findFirstIn(f.drop(1).dropRight(1)).isDefined =>
        Some(s"date_format($e, '${translatePgDateFormat(f.drop(1).dropRight(1))}')")
      case _ => None // numeric masks: Spark-native to_char
    }
    // extract(epoch FROM e): Spark's EXTRACT lacks the epoch field
    val epochRe = """(?i)\bextract\s*\(\s*epoch\s+from\b""".r
    var progress = true
    while (progress) {
      progress = false
      val spans = literalSpans(s)
      epochRe.findAllMatchIn(s).find(mm => !inLiteral(spans, mm.start)).foreach { mm =>
        val open = s.indexOf('(', mm.start)
        val close = balancedClose(s, open)
        if (close < 0) throw new IllegalArgumentException(
          s"unbalanced parens in extract(epoch FROM …): $s")
        val inner = s.substring(mm.end, close).trim
        s = s.substring(0, mm.start) +
          s"(CAST(unix_micros(CAST(($inner) AS TIMESTAMP)) AS DOUBLE) / 1000000)" +
          s.substring(close + 1)
        progress = true
      }
    }
    s = rewriteCalls(s, "date_part") {
      case Seq(f, e) if f.equalsIgnoreCase("'epoch'") =>
        Some(s"(CAST(unix_micros(CAST(($e) AS TIMESTAMP)) AS DOUBLE) / 1000000)")
      case _ => None // every other field is Spark-native date_part
    }
    s
  }

  /** PG `agg(args) FILTER (WHERE cond) OVER …` → the CASE-inside-the-
    * aggregate equivalent: Spark supports FILTER on plain aggregates but
    * not on window functions ("Window aggregate function with filter
    * predicate is not supported yet"). sum/avg/min/max/count ignore the
    * CASE's NULLs exactly as FILTER excludes the rows; `count(*)` counts
    * a CASE over 1. Only a FILTER followed by OVER rewrites — the plain
    * aggregate form stays on Spark's native (codegen'd) path. (Edge: an
    * array_agg of NULL values on filter-matching rows would drop them —
    * Spark's collect_list skips NULLs; documented divergence.) */
  private def rewriteWindowFilter(sql: String): String = {
    if (!sql.toUpperCase.contains("FILTER")) return sql
    val re = """(?i)\bFILTER\s*\(\s*WHERE\b""".r
    var out = sql
    var progress = true
    while (progress) {
      progress = false
      val spans = literalSpans(out)
      re.findAllMatchIn(out).find { mm =>
        if (inLiteral(spans, mm.start)) false
        else {
          val filterClose = balancedClose(out, out.indexOf('(', mm.start))
          filterClose > 0 &&
            out.substring(filterClose + 1).matches("""(?is)\s*OVER\b.*""")
        }
      }.foreach { mm =>
        val filterOpen = out.indexOf('(', mm.start)
        val filterClose = balancedClose(out, filterOpen)
        val whereEnd = {
          val wm = """(?is)^\s*WHERE\b""".r
            .findFirstMatchIn(out.substring(filterOpen + 1)).get
          filterOpen + 1 + wm.end
        }
        val cond = out.substring(whereEnd, filterClose).trim
        // backward: the aggregate call ends at the ')' just before FILTER
        var k = mm.start - 1
        while (k >= 0 && out.charAt(k).isWhitespace) k -= 1
        require(k >= 0 && out.charAt(k) == ')',
          s"FILTER must follow an aggregate call: ${out.substring(0, mm.start)}")
        var depth = 0; var j = k; var open = -1
        while (j >= 0 && open < 0) {
          val span = spans.find { case (a, b) => j >= a && j < b }
          if (span.isDefined) j = span.get._1 - 1
          else {
            out.charAt(j) match {
              case ')' => depth += 1
              case '(' => depth -= 1; if (depth == 0) open = j
              case _ =>
            }
            if (open < 0) j -= 1
          }
        }
        require(open > 0, s"unbalanced aggregate call before FILTER: $out")
        var f = open - 1
        while (f >= 0 && (out.charAt(f).isLetterOrDigit || out.charAt(f) == '_')) f -= 1
        val fn = out.substring(f + 1, open)
        require(fn.nonEmpty, s"FILTER must follow a function call: $out")
        val args = topSplitArgs(out.substring(open + 1, k))
        val first = args.head
        val distinctRe = """(?is)^DISTINCT\s+(.*)$""".r
        val newFirst =
          if (fn.equalsIgnoreCase("count") && first == "*")
            s"CASE WHEN $cond THEN 1 END"
          else distinctRe.findFirstMatchIn(first) match {
            case Some(dm) => s"DISTINCT CASE WHEN $cond THEN ${dm.group(1)} END"
            case None => s"CASE WHEN $cond THEN $first END"
          }
        val newCall = s"$fn(${(newFirst +: args.tail).mkString(", ")})"
        out = out.substring(0, f + 1) + newCall + out.substring(filterClose + 1)
        progress = true
      }
    }
    out
  }

  /** PG row-locking clauses — `FOR UPDATE | NO KEY UPDATE | SHARE |
    * KEY SHARE [OF tbl, …] [NOWAIT | SKIP LOCKED]` — peel to a no-op:
    * this engine's snapshot copy-on-write model has no row locks to
    * take (single-writer semantics; the reference holds Percolator
    * locks here, out of analytic scope per SURVEY §3.1). ORMs emit
    * these on every SELECT-for-write; parsing must not fail on them.
    * Only a top-paren-depth clause peels; SKIP LOCKED semantics (skip
    * contended rows) would silently change results, so it is accepted
    * as a no-op too — under a single writer no row is ever locked,
    * which makes skip-nothing exactly correct. */
  private def rewriteLockingClause(sql: String): String = {
    if (!sql.toUpperCase.contains("FOR")) return sql
    val re = ("""(?i)\bFOR\s+(?:UPDATE|NO\s+KEY\s+UPDATE|SHARE|KEY\s+SHARE)""" +
      """(?:\s+OF\s+[\w"]+(?:\s*,\s*[\w"]+)*)?(?:\s+NOWAIT|\s+SKIP\s+LOCKED)?""").r
    val spans = literalSpans(sql)
    re.replaceSomeIn(sql, m => {
      if (inLiteral(spans, m.start)) None
      else {
        var d = 0; var i = 0
        while (i < m.start) {
          if (!inLiteral(spans, i)) {
            val c = sql.charAt(i)
            if (c == '(') d += 1 else if (c == ')') d -= 1
          }
          i += 1
        }
        if (d == 0) Some("") else None
      }
    })
  }

  /** PG double-quoted identifiers → Spark backticks: `"returning"` →
    * `` `returning` ``. Without this, qualified `a."kw"` is a Spark
    * PARSE_SYNTAX_ERROR and a bare `"kw"` parses as a STRING LITERAL in
    * Spark's default mode — a silent wrong answer, the worst failure
    * shape. Character scan, not regex: a `"` inside a single-quoted
    * literal ('' escape honored) is content; `""` inside a quoted
    * identifier is PG's escape for one `"`; a backtick inside the
    * identifier body is escaped by doubling (Spark's rule). */
  private def rewriteQuotedIdents(sql: String): String = {
    if (sql.indexOf('"') < 0) return sql
    val out = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { // copy the whole single-quoted literal verbatim
        out += c; i += 1
        var done = false
        while (i < sql.length && !done) {
          out += sql.charAt(i)
          if (sql.charAt(i) == '\'') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') { out += '\''; i += 2 }
            else { done = true; i += 1 }
          } else i += 1
        }
      } else if (c == '"') {
        val body = new StringBuilder
        i += 1
        var done = false
        while (i < sql.length && !done) {
          if (sql.charAt(i) == '"') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '"') { body += '"'; i += 2 }
            else { done = true; i += 1 }
          } else { body += sql.charAt(i); i += 1 }
        }
        out += '`'
        out ++= body.toString.replace("`", "``")
        out += '`'
      } else { out += c; i += 1 }
    }
    out.toString
  }

  def rewrite(sql: String): String = {
    def gated(re: scala.util.matching.Regex, s: String, opPos: scala.util.matching.Regex.Match => Int,
        repl: scala.util.matching.Regex.Match => String): String = {
      val spans = literalSpans(s)
      re.replaceSomeIn(s, m =>
        if (inLiteral(spans, opPos(m))) None
        else Some(java.util.regex.Matcher.quoteReplacement(repl(m))))
    }
    var s = gated(path, rewriteQuotedIdents(sql), _.end(1),
      m => s"get_json_object(${m.group(1)}, '$$.${m.group(2).split(",").map(_.trim).mkString(".")}')")
    var changed = true
    while (changed) {
      val before = s
      s = gated(keyOnGjo, s, _.end(2),
        m => s"get_json_object(${m.group(1)}, '${m.group(2)}.${m.group(4)}')")
      s = gated(idxOnGjo, s, _.end(2),
        m => s"get_json_object(${m.group(1)}, '${m.group(2)}[${m.group(4)}]')")
      s = gated(keyOnIdent, s, _.end(1),
        m => s"get_json_object(${m.group(1)}, '$$.${m.group(3)}')")
      s = gated(idxOnIdent, s, _.end(1),
        m => s"get_json_object(${m.group(1)}, '$$[${m.group(3)}]')")
      changed = s != before
    }
    // PG regex-match operators: `~` / `~*` / `!~` / `!~*` → RLIKE (the
    // case-insensitive forms inject an inline (?i) flag). Only literal
    // patterns rewrite — a computed pattern stays untouched.
    s = gated(regexOp, s, _.start(3) - 1, m => {
      val lhs = m.group(1); val neg = m.group(2) == "!"; val ci = m.group(3) == "*"
      val pat = if (ci) "'(?i)" + m.group(4).drop(1) else m.group(4)
      val e = s"$lhs RLIKE $pat"
      if (neg) s"NOT ($e)" else e
    })
    s = rewriteCasts(s)
    s = rewriteAggOrderBy(s)
    s = rewriteFetchFirst(s)
    s = rewriteTableSample(s)
    s = rewriteGenerateSeries(s)
    s = rewritePgFunctions(s)
    s = rewriteWindowFilter(s)
    s = rewriteLockingClause(s)
    s = rewriteArrayLiteral(s)
    s = rewriteAnyAll(s)
    s = rewriteSimilarTo(s)
    s = rewriteDistinctOn(s)
    // PG system functions the reference serves at protocol level
    // (postgres/PostgresConnectionHandler.java:202-213,296-371)
    s = s.replaceAll("(?i)\\bVERSION\\s*\\(\\)", "'graft (Spark " +
      org.apache.spark.SPARK_VERSION + ")'")
    s = s.replaceAll("(?i)\\bCURRENT_DATABASE\\s*\\(\\)", "current_database()")
    s
  }

  /** Fold `current_database()` to a string LITERAL of the calling
    * context's database. Spark's builtin resolves at optimization time
    * from the session-GLOBAL catalog — under per-connection database
    * binding a sibling context's USE re-sync can land between a
    * statement's analysis and its first action, so the builtin would
    * answer the wrong database. String literals are opaque (a
    * "current_database()" inside text is content, same discipline as
    * the placeholder substitution paths). */
  def bindCurrentDatabase(sql: String, db: String): String = {
    if (!sql.toLowerCase.contains("current_database")) return sql
    val pat = java.util.regex.Pattern.compile(
      "(?i)\\bCURRENT_DATABASE\\s*\\(\\s*\\)")
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { // copy string literal verbatim ('' escape)
        out += c; i += 1
        var closed = false
        while (i < sql.length && !closed) {
          out += sql.charAt(i)
          if (sql.charAt(i) == '\'') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
              out += '\''; i += 2
            } else { closed = true; i += 1 }
          } else i += 1
        }
      } else {
        // cheap prefix probe BEFORE any regex work — a matcher.find per
        // character would make this rewrite quadratic on long statements
        if ((c == 'c' || c == 'C') &&
            sql.regionMatches(true, i, "current_database", 0, 16)) {
          val m = pat.matcher(sql)
          if (m.find(i) && m.start == i) {
            out ++= "'" + db.replace("'", "''") + "'"
            i = m.end
          } else { out += c; i += 1 }
        } else { out += c; i += 1 }
      }
    }
    out.toString
  }
}

/** Declared-SQL-type → Spark type (SURVEY §1.3 table; reference
  * kv/TableMetadata.java:293-353). TIME and INTERVAL map to string
  * (Spark has no TIME type; SURVEY §7.4 "type edges"). */
object TypeMap {
  def toSpark(sqlType: String): DataType = {
    val t = sqlType.trim.toUpperCase
    if (t.endsWith("[]")) return ArrayType(toSpark(t.dropRight(2)))
    val dec = """(?:NUMERIC|DECIMAL)\s*\((\d+)\s*,\s*(\d+)\)""".r
    val decP = """(?:NUMERIC|DECIMAL)\s*\((\d+)\)""".r
    t match {
      case "INT" | "INTEGER" | "SMALLINT" | "SERIAL" | "SMALLSERIAL" => IntegerType
      case "BIGINT" | "LONG" | "BIGSERIAL" => LongType
      case s if s.startsWith("VARCHAR") || s.startsWith("CHAR") || s == "TEXT" => StringType
      case dec(p, s) => DecimalType(p.toInt, s.toInt)
      case decP(p) => DecimalType(p.toInt, 0)
      case "NUMERIC" | "DECIMAL" => DecimalType(38, 18)
      case "DOUBLE" | "DOUBLE PRECISION" => DoubleType
      case "REAL" | "FLOAT" => FloatType
      case "BOOLEAN" | "BOOL" => BooleanType
      case "DATE" => DateType
      case "TIME" => StringType
      case "TIMESTAMP" | "TIMESTAMPTZ" | "TIMESTAMP WITH TIME ZONE" => TimestampType
      case "INTERVAL" => StringType
      case "JSON" | "JSONB" => StringType
      case "BLOB" | "BYTEA" => BinaryType
      case "UUID" => StringType
      case other => StringType // reference default branch is String too
    }
  }

  /** Reverse mapping for schema inference (CTAS: declared types from a
    * SELECT's resolved Spark schema). Total — anything unmapped degrades
    * to TEXT, mirroring [[toSpark]]'s default branch. */
  def toSql(dt: DataType): String = dt match {
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE PRECISION"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
    case BinaryType => "BYTEA"
    case ArrayType(e, _) => toSql(e) + "[]"
    case _ => "TEXT"
  }

  def isSerial(t: String): Boolean = {
    val u = t.trim.toUpperCase
    u == "SERIAL" || u == "BIGSERIAL" || u == "SMALLSERIAL"
  }
}
