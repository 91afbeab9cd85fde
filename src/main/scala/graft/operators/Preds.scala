package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.cypher.Ast

/**
 * WHERE predicate → Catalyst Column, shared by the pushdown path (PatternExec
 * filters the node/edge scan, columns are bare property names) and the
 * residual path (GraphDB filters matched rows, columns are `binding_prop`) —
 * the `resolve` function is the only difference between the two.
 *
 * Null semantics match Cypher's ternary logic for free: a comparison over a
 * null property yields null, `!null` stays null, and Spark's Filter drops
 * non-true rows — exactly Cypher's "null is not true".
 */
object Preds {
  /** openCypher value functions (names lowercased by the parser) → Column
    * transforms, shared by the match path (over `binding_prop` columns) and
    * the post-WITH path (over bare stage columns). Numeric returns follow
    * Spark's native types (ceil/floor → BIGINT, size → length cast LONG);
    * oracle SQL casts to match. */
  val valueFn: Map[String, Column => Column] = Map(
    "toupper"   -> (c => upper(c)),
    "tolower"   -> (c => lower(c)),
    "trim"      -> (c => trim(c)),
    "size"      -> (c => length(c).cast("long")),
    "abs"       -> (c => abs(c)),
    "ceil"      -> (c => ceil(c)),
    "floor"     -> (c => floor(c)),
    "round"     -> (c => round(c)),
    "sqrt"      -> (c => sqrt(c)),
    "sign"      -> (c => signum(c)),
    "tointeger" -> (c => c.cast("long")),
    "tofloat"   -> (c => c.cast("double")),
    "tostring"  -> (c => c.cast("string")))

  def column(p: Ast.Pred, resolve: (String, String) => Column): Column =
    column(p, resolve, pp => throw new IllegalArgumentException(
      s"pattern predicate is not supported in this position: ${pp.path}"))

  /** `pat` resolves a nested pattern predicate to its pre-joined exists-flag
    * column (GraphDB.run joins one boolean flag per distinct pattern before
    * filtering; bare / NOT-ed conjuncts never reach here — they compile to
    * semi/anti joins instead). */
  def column(p: Ast.Pred, resolve: (String, String) => Column,
             pat: Ast.PatPred => Column): Column = p match {
    case pp: Ast.PatPred => pat(pp)
    case Ast.Cmp(b, prop, op, v) =>
      val c = resolve(b, prop)
      op match {
        case "="           => c === lit(v)
        case "<>"          => c =!= lit(v)
        case "<"           => c < lit(v)
        case "<="          => c <= lit(v)
        case ">"           => c > lit(v)
        case ">="          => c >= lit(v)
        case "STARTS WITH" => c.startsWith(v.toString)
        case "ENDS WITH"   => c.endsWith(v.toString)
        case "CONTAINS"    => c.contains(v.toString)
        // empty list → always-false literal (Cypher: `x IN []` is false);
        // isin() with no args would be an analysis error
        case "IN" => v.asInstanceOf[Seq[Any]] match {
          case Seq() => lit(false)
          case vs    => c.isin(vs: _*)
        }
        case other => throw new IllegalArgumentException(s"unknown operator $other")
      }
    case Ast.And(l, r)            => column(l, resolve, pat) && column(r, resolve, pat)
    case Ast.Or(l, r)             => column(l, resolve, pat) || column(r, resolve, pat)
    case Ast.Not(x)               => !column(x, resolve, pat)
    case Ast.IsNull(b, prop, neg) =>
      if (neg) resolve(b, prop).isNotNull else resolve(b, prop).isNull
  }
}
