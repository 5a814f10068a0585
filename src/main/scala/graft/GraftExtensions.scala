package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{
  CosineSimilarityExpr,
  LangIdExpressions,
  LangIdNgramExpr,
  MinHashSignatureExpr,
  ShingleHashesExpr,
  SignatureExpressions,
  SimHash64Expr,
  VectorExpressions
}

/** Session-extension injection point (the idiomatic registration path for
  * engine-supplied Catalyst expressions):
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or cluster-wide: spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Registers the native functions so plain SQL can call them
  * (`SELECT graft_cosine_sim(a, b)`). Operators also self-register via
  * [[graft.functions.VectorExpressions.register]] for sessions built
  * without extensions — both paths resolve to the same expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (
        FunctionIdentifier(VectorExpressions.CosineName),
        new ExpressionInfo(
          classOf[CosineSimilarityExpr].getCanonicalName,
          VectorExpressions.CosineName),
        VectorExpressions.cosineBuilder))
    e.injectFunction(
      (
        FunctionIdentifier(SignatureExpressions.MinHashName),
        new ExpressionInfo(
          classOf[MinHashSignatureExpr].getCanonicalName,
          SignatureExpressions.MinHashName),
        SignatureExpressions.minHashBuilder))
    e.injectFunction(
      (
        FunctionIdentifier(SignatureExpressions.SimHashName),
        new ExpressionInfo(
          classOf[SimHash64Expr].getCanonicalName,
          SignatureExpressions.SimHashName),
        SignatureExpressions.simHashBuilder))
    e.injectFunction(
      (
        FunctionIdentifier(SignatureExpressions.ShingleHashName),
        new ExpressionInfo(
          classOf[ShingleHashesExpr].getCanonicalName,
          SignatureExpressions.ShingleHashName),
        SignatureExpressions.shingleHashBuilder))
    e.injectFunction(
      (
        FunctionIdentifier(LangIdExpressions.Name),
        new ExpressionInfo(
          classOf[LangIdNgramExpr].getCanonicalName,
          LangIdExpressions.Name),
        LangIdExpressions.langIdBuilder))
  }
}
