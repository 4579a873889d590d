package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{GramHashes, MinhashBands, ModalRunLength, NfcNormalize, ScriptCounts, SimhashFold, TopKAgg, VecDot, VecDotLong, WinnowMins}

/** Session-extension entry point: registers the engine's native
  * expressions with the function registry so they're callable from SQL
  * (`SELECT vec_dot(a.embedding, b.embedding) …`) as well as from the
  * Column API. Wire it with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes two array args")
        VecDot(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot_long"),
      new ExpressionInfo(classOf[VecDotLong].getName, "vec_dot_long"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "vec_dot_long(a, b) takes two array<bigint> args")
        VecDotLong(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fold"),
      new ExpressionInfo(classOf[SimhashFold].getName, "simhash_fold"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "simhash_fold(hashes[, bits]) takes an array arg and optional width")
        if (args.length == 1) SimhashFold(args.head)
        else args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(b: Int, _) =>
            SimhashFold(args.head, b)
          case other => throw new IllegalArgumentException(
            s"simhash_fold's bits must be an integer literal, got $other")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinhashBands].getName, "minhash_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "minhash_bands(hashes) takes one array arg")
        MinhashBands(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("modal_run_length"),
      new ExpressionInfo(classOf[ModalRunLength].getName, "modal_run_length"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "modal_run_length(sorted) takes one sorted array<string> arg")
        ModalRunLength(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_mins"),
      new ExpressionInfo(classOf[WinnowMins].getName, "winnow_mins"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "winnow_mins(hashes[, win]) takes an array arg and optional window")
        if (args.length == 1) WinnowMins(args.head)
        else args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _) =>
            WinnowMins(args.head, w)
          case other => throw new IllegalArgumentException(
            s"winnow_mins's win must be an integer literal, got $other")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("gram_hashes60"),
      new ExpressionInfo(classOf[GramHashes].getName, "gram_hashes60"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "gram_hashes60(tokens, n[, distinct]) takes a token array, an " +
            "integer n, and an optional distinct flag")
        val lit = org.apache.spark.sql.catalyst.expressions.Literal
        val n = args(1) match {
          case lit(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"gram_hashes60's n must be an integer literal, got $other")
        }
        val distinct = if (args.length < 3) true else args(2) match {
          case lit(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"gram_hashes60's distinct must be a boolean literal, got $other")
        }
        GramHashes(args.head, n, distinct)
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"), // same name as DuckDB's
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(text) takes one string arg")
        NfcNormalize(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("script_counts"),
      new ExpressionInfo(classOf[ScriptCounts].getName, "script_counts"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "script_counts(text) takes one string arg")
        ScriptCounts(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[graft.expressions.BpeCount].getName,
        "bpe_token_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "bpe_token_count(text) takes one string arg")
        graft.expressions.BpeCount(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "top_k"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "top_k(score, label, k) takes three args")
        val k = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"top_k's k must be an integer literal, got $other")
        }
        TopKAgg(args.head, args(1), k).toAggregateExpression()
      }))
    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    ext.injectFunction((
      new FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(
        classOf[graft.expressions.HilbertIndex].getName, "hilbert_index"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "hilbert_index(a, b, bits) takes two bigints and a literal width")
        graft.expressions.HilbertIndex(args.head, args(1),
          intLit(args(2), "hilbert_index's bits"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_index_n"),
      new ExpressionInfo(
        classOf[graft.expressions.HilbertIndexN].getName, "hilbert_index_n"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "hilbert_index_n(coords, dims, bits) takes an array<bigint> and " +
            "two literal ints")
        graft.expressions.HilbertIndexN(args.head,
          intLit(args(1), "hilbert_index_n's dims"),
          intLit(args(2), "hilbert_index_n's bits"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("mmr_select"),
      new ExpressionInfo(
        classOf[graft.expressions.MmrSelect].getName, "mmr_select"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "mmr_select(candidates, k) takes a struct array and a literal k")
        graft.expressions.MmrSelect(args.head,
          intLit(args(1), "mmr_select's k"))
      }))
  }
}
