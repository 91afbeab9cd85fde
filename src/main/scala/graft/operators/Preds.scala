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
  def column(p: Ast.Pred, resolve: (String, String) => Column): Column = p match {
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
    case Ast.And(l, r)            => column(l, resolve) && column(r, resolve)
    case Ast.Or(l, r)             => column(l, resolve) || column(r, resolve)
    case Ast.Not(x)               => !column(x, resolve)
    case Ast.IsNull(b, prop, neg) =>
      if (neg) resolve(b, prop).isNotNull else resolve(b, prop).isNull
  }
}
