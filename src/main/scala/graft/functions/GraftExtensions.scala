package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering the graft native expressions
  * as SQL functions, so a cluster user gets them with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`:
  *
  *   SELECT graft_minhash64(shingle_hashes),
  *          graft_simhash63(token_hashes) FROM docs
  *
  * The Scala API (`graft.dedup.Dedup.minhashSignatureFromHashes` /
  * `simhashFromHashes`) builds the same expressions directly and needs no
  * extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_minhash64"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_minhash64 takes exactly one array<bigint> argument")
        val (as, bs) = graft.dedup.Dedup.hashParams(64).unzip
        MinHashSig(args.head, as, bs)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash63"),
      new ExpressionInfo(classOf[SimHash63].getName, "graft_simhash63"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash63 takes exactly one array<bigint> argument")
        SimHash63(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_shingle_hashes(text): distinct 3-shingle md5h32 set")
        ShingleHashes(args.head, w = 3, distinct = true)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_token_hashes63"),
      new ExpressionInfo(classOf[TokenHashes63].getName, "graft_token_hashes63"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_token_hashes63(text): per-token md5h63 array")
        TokenHashes63(args.head)
      }))
  }
}
