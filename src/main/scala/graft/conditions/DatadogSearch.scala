package graft.conditions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `datadog_search` condition syntax → Catalyst predicate compiler
  * (reference: src/conditions/datadog_search.rs — the second of the two
  * condition languages a route/filter config accepts; syntax is the public
  * Datadog log-search query language).
  *
  * Supported subset: `field:value`, quoted phrases `field:"a b"`, value
  * wildcards (`field:ab*`), numeric comparisons (`field:>5`, `field:<=3`),
  * inclusive ranges (`field:[1 TO 100]`), bare terms (substring match on
  * the default field), `AND` / `OR` / `NOT` / `-term`, parentheses, and
  * implicit AND between adjacent terms. Compiles to a single codegen'd
  * `Column` predicate — the filter can push down to the scan like any
  * native condition.
  */
object DatadogSearch {

  // ---------------- AST ----------------

  sealed trait Ast
  final case class AndA(l: Ast, r: Ast) extends Ast
  final case class OrA(l: Ast, r: Ast) extends Ast
  final case class NotA(e: Ast) extends Ast
  /** field=None → bare term over the default field. */
  final case class Term(field: Option[String], value: Val) extends Ast

  sealed trait Val
  final case class Word(s: String) extends Val   // may contain * wildcards
  final case class Phrase(s: String) extends Val // quoted, literal
  final case class Cmp(op: String, n: Double) extends Val
  final case class RangeV(lo: String, hi: String) extends Val

  // ---------------- tokenizer ----------------

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object LB extends Tok
  private case object RB extends Tok
  private case object ColonT extends Tok
  private case object MinusT extends Tok
  private final case class WordT(s: String) extends Tok
  private final case class PhraseT(s: String) extends Tok

  private def tokenize(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val n = q.length
    def isWordChar(c: Char): Boolean =
      c.isLetterOrDigit || "._*@/>=<+-".contains(c)
    while (i < n) {
      val c = q(i)
      c match {
        case ' ' | '\t' | '\n' | '\r' => i += 1
        case '(' => out += LP; i += 1
        case ')' => out += RP; i += 1
        case '[' => out += LB; i += 1
        case ']' => out += RB; i += 1
        case ':' => out += ColonT; i += 1
        case '"' =>
          val j = q.indexOf('"', i + 1)
          require(j > 0, s"unterminated quote at $i in: $q")
          out += PhraseT(q.substring(i + 1, j)); i = j + 1
        case '-' if out.lastOption.forall(t => t == LP || t == MinusT) ||
                    (i == 0 || q(i - 1).isWhitespace || q(i - 1) == '(') =>
          out += MinusT; i += 1
        case _ if isWordChar(c) =>
          var j = i
          while (j < n && isWordChar(q(j))) j += 1
          out += WordT(q.substring(i, j)); i = j
        case other => throw new IllegalArgumentException(s"bad char '$other' in: $q")
      }
    }
    out.toList
  }

  // ---------------- parser (recursive descent) ----------------

  private final class P(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }
    def expect(t: Tok): Unit = {
      val g = next(); require(g == t, s"expected $t, got $g")
    }

    def parseOr(): Ast = {
      var l = parseAnd()
      while (peek.contains(WordT("OR")) || peek.contains(WordT("or"))) {
        next(); l = OrA(l, parseAnd())
      }
      l
    }

    def parseAnd(): Ast = {
      var l = parseUnary()
      var continue = true
      while (continue) peek match {
        case Some(WordT("AND")) | Some(WordT("and")) => next(); l = AndA(l, parseUnary())
        case Some(WordT("OR")) | Some(WordT("or")) | Some(RP) | None => continue = false
        case Some(_) => l = AndA(l, parseUnary()) // adjacency = implicit AND
      }
      l
    }

    def parseUnary(): Ast = peek match {
      case Some(WordT("NOT")) | Some(WordT("not")) => next(); NotA(parseUnary())
      case Some(MinusT) => next(); NotA(parseUnary())
      case Some(LP) =>
        next(); val e = parseOr(); expect(RP); e
      case _ => parseTerm()
    }

    def parseTerm(): Ast = next() match {
      case PhraseT(s) => Term(None, Phrase(s))
      case WordT(w) =>
        if (peek.contains(ColonT)) { next(); Term(Some(w), parseValue()) }
        else Term(None, Word(w))
      case t => throw new IllegalArgumentException(s"unexpected $t")
    }

    def parseValue(): Val = next() match {
      case PhraseT(s) => Phrase(s)
      case LB =>
        val lo = word(); val to = word()
        require(to.equalsIgnoreCase("TO"), s"expected TO in range, got $to")
        val hi = word(); expect(RB); RangeV(lo, hi)
      case WordT(w) =>
        val m = "^(>=|<=|>|<)(.+)$".r
        w match {
          case m(op, num) if isNum(num) => Cmp(op, num.toDouble)
          case _ => Word(w)
        }
      case t => throw new IllegalArgumentException(s"unexpected value token $t")
    }

    private def word(): String = next() match {
      case WordT(w) => w
      case PhraseT(s) => s
      case t => throw new IllegalArgumentException(s"expected word, got $t")
    }
  }

  private def isNum(s: String): Boolean =
    s.nonEmpty && s.matches("[+-]?\\d+(\\.\\d+)?")

  def parse(query: String): Ast = {
    val p = new P(tokenize(query))
    val ast = p.parseOr()
    require(p.toks.isEmpty, s"trailing tokens ${p.toks} in: $query")
    ast
  }

  // ---------------- compile to Column ----------------

  /** SQL LIKE pattern from a datadog wildcard word (escape % and _). */
  private def likePattern(w: String): String =
    w.replace("%", "\\%").replace("_", "\\_").replace("*", "%")

  /** Compile `query` against `field` resolution (name → Column) with
    * `defaultField` receiving bare terms. Every term is guarded with
    * `isNotNull &&` rather than `coalesce(_, false)` — same three-valued
    * behavior (a null field never matches, and `NOT term` keeps the row),
    * but the conjunction still PUSHES DOWN to the scan as
    * `And(IsNotNull, …)`, which a coalesce wrapper would block.
    */
  def compile(query: String, field: String => Column, defaultField: Column): Column = {
    def go(a: Ast): Column = a match {
      case AndA(l, r) => go(l) && go(r)
      case OrA(l, r) => go(l) || go(r)
      case NotA(e) => !go(e)
      case Term(None, Word(w)) =>
        defaultField.isNotNull && (
          if (w.contains("*")) defaultField.cast("string").like(likePattern(w))
          else defaultField.cast("string").contains(w))
      case Term(None, Phrase(s)) =>
        defaultField.isNotNull && defaultField.cast("string").contains(s)
      case Term(None, v) =>
        throw new IllegalArgumentException(s"bare $v requires a field")
      case Term(Some(f), v) =>
        val c = field(f)
        v match {
          case Word("*") => c.isNotNull
          case Word(w) if w.contains("*") => c.isNotNull && c.cast("string").like(likePattern(w))
          case Word(w) if isNum(w) => c.isNotNull && c.cast("double") === lit(w.toDouble)
          case Word(w) => c.isNotNull && c.cast("string") === lit(w)
          case Phrase(s) => c.isNotNull && c.cast("string") === lit(s)
          case Cmp(">", n) => c.isNotNull && c.cast("double") > lit(n)
          case Cmp(">=", n) => c.isNotNull && c.cast("double") >= lit(n)
          case Cmp("<", n) => c.isNotNull && c.cast("double") < lit(n)
          case Cmp("<=", n) => c.isNotNull && c.cast("double") <= lit(n)
          case Cmp(op, _) => throw new IllegalArgumentException(s"bad op $op")
          case RangeV(lo, hi) if isNum(lo) && isNum(hi) =>
            c.isNotNull && c.cast("double").between(lit(lo.toDouble), lit(hi.toDouble))
          case RangeV(lo, hi) => c.isNotNull && c.cast("string").between(lit(lo), lit(hi))
        }
    }
    go(parse(query))
  }

  /** Convenience: resolve fields as top-level columns. */
  def compile(query: String, defaultField: String): Column =
    compile(query, col, col(defaultField))
}
