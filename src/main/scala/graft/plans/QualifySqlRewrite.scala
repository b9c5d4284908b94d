package graft.plans

/** Textual QUALIFY support for `spark.sql` — the one SQL-surface gap vs
  * the reference's Snowflake dialect (design.sql:181,265; adhoc.sql:77,
  * 124 all end SELECTs with `QUALIFY row_number() OVER (...) = 1`).
  *
  * Spark has no QUALIFY clause, but it has everything the clause
  * desugars to: lateral column aliases (the predicate may reference
  * select-list aliases), window extraction from a projection, and
  * `SELECT * EXCEPT (c)`. So each
  *
  * {{{ SELECT <head> FROM <body> QUALIFY <pred> [<tail>] }}}
  *
  * rewrites to
  *
  * {{{ SELECT * EXCEPT (__graft_qualify) FROM (
  *       SELECT <head>, (<pred>) AS __graft_qualify FROM <body>
  *     ) __graft_qualify_sq WHERE __graft_qualify [<tail>] }}}
  *
  * — the window predicate is computed as a projection column (where
  * Spark's analyzer extracts the Window node), filtered, then dropped.
  * ORDER BY / LIMIT after QUALIFY stay outside the subquery, preserving
  * Snowflake's filter-then-order evaluation order.
  *
  * The scanner is quote-, comment- and paren-aware and rewrites
  * innermost-first, so QUALIFY works inside CTE bodies, subqueries and
  * set-operation branches. `SELECT DISTINCT ... QUALIFY` is rejected:
  * the desugared projection column would change the DISTINCT key.
  */
object QualifySqlRewrite {

  private val Flag = "__graft_qualify"

  /** Rewrite every QUALIFY clause in `sql`; returns the input unchanged
    * (same reference) when no QUALIFY keyword is present. */
  def apply(sql: String): String = {
    var cur = sql
    var guard = 0
    while ({
      val toks = scan(cur)
      val q = toks.find(_.word == "QUALIFY")
      q match {
        case Some(t) =>
          cur = rewriteOne(cur, toks, t)
          guard += 1
          if (guard > 64)
            throw new IllegalStateException("QUALIFY rewrite did not terminate")
          true
        case None => false
      }
    }) ()
    cur
  }

  /** A keyword token at a given offset and paren depth. */
  private case class Tok(word: String, start: Int, depth: Int)

  /** Uppercased identifier-like tokens with positions and paren depth,
    * skipping string literals, quoted identifiers and comments. */
  private def scan(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    var depth = 0
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < s.length && !(s.charAt(i) == '\'' &&
            (i + 1 >= s.length || s.charAt(i + 1) != '\'' || { i += 1; false }))) i += 1
          i += 1
        case '"' =>
          i += 1; while (i < s.length && s.charAt(i) != '"') i += 1; i += 1
        case '`' =>
          i += 1; while (i < s.length && s.charAt(i) != '`') i += 1; i += 1
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < s.length && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
          i += 2
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c if isWord(c) =>
          val st = i
          while (i < s.length && isWord(s.charAt(i))) i += 1
          out += Tok(s.substring(st, i).toUpperCase(java.util.Locale.ROOT), st, depth)
        case _ => i += 1
      }
    }
    out.result()
  }

  /** Keywords that terminate a QUALIFY predicate at the same depth. */
  private val PredEnd = Set("ORDER", "LIMIT", "OFFSET", "UNION",
    "INTERSECT", "EXCEPT", "MINUS", "WINDOW")

  private def rewriteOne(s: String, toks: Vector[Tok], q: Tok): String = {
    val qi = toks.indexOf(q)
    // enclosing SELECT: last SELECT token at the same depth before QUALIFY
    val si = toks.lastIndexWhere(t =>
      t.word == "SELECT" && t.depth == q.depth && t.start < q.start, qi)
    if (si < 0)
      throw new IllegalArgumentException(
        "QUALIFY without an enclosing SELECT")
    val sel = toks(si)
    // top-level FROM of that select, between SELECT and QUALIFY
    val from = toks.slice(si + 1, qi).find(t =>
      t.word == "FROM" && t.depth == q.depth)
      .getOrElse(throw new IllegalArgumentException(
        "QUALIFY requires a FROM clause"))
    if (toks.slice(si + 1, qi).exists(t =>
        t.word == "DISTINCT" && t.depth == q.depth && t.start < from.start))
      throw new IllegalArgumentException(
        "QUALIFY with SELECT DISTINCT is not supported " +
          "(the desugared predicate column would change the DISTINCT key)")
    // predicate runs until a same-depth terminator keyword, a paren that
    // closes below the QUALIFY depth, or end of input
    val qEndTok = q.start + "QUALIFY".length
    val term = toks.drop(qi + 1).find(t =>
      (PredEnd.contains(t.word) && t.depth == q.depth) || t.depth < q.depth)
    val predEnd = term match {
      case Some(t) if t.depth < q.depth =>
        // token at shallower depth — predicate ends at the ')' that
        // closed our depth: scan back for it
        var p = t.start
        while (s.charAt(p) != ')') p -= 1
        p
      case Some(t) => t.start
      case None =>
        val semi = s.indexOf(';', qEndTok)
        if (semi >= 0) semi else s.length
    }
    val head = s.substring(sel.start, from.start)         // SELECT <list>
    val body = s.substring(from.start, q.start)           // FROM ... [GROUP/HAVING/WHERE]
    val pred = s.substring(qEndTok, predEnd).trim
    if (pred.isEmpty)
      throw new IllegalArgumentException("empty QUALIFY predicate")
    s.substring(0, sel.start) +
      s"SELECT * EXCEPT ($Flag) FROM (" +
      head.trim + s", ($pred) AS $Flag " + body.trim +
      s") ${Flag}_sq WHERE $Flag " +
      s.substring(predEnd)
  }
}
