package graft

import org.apache.spark.sql.SparkSession

/** Production-vocabulary BPE training measurement — the operational
  * "how long does a real tokenizer train take" number the SCALING
  * reports cite (the trainer's incremental-heap complexity argument,
  * made a wall-clock datapoint instead of a claim).
  *
  * Two legs, because the synthetic corpus cannot exercise one of them:
  *
  *  1. CORPUS leg — [[graft.operators.Bpe.train]] end to end on
  *     SPARK_GRAFT_SF_DIR's documents (distributed word count + driver
  *     loop). The word-salad corpus holds only a few dozen distinct
  *     words, so the pair inventory exhausts far below a production
  *     vocabulary — the leg reports merges_trained honestly rather
  *     than pretending a 32k train happened.
  *  2. SYNTHETIC leg — [[graft.operators.Bpe.trainFromWordCounts]]
  *     (the driver-side loop, the piece whose 32k-merge cost was the
  *     unquantified claim) over a seeded ~`syntheticWords`-distinct
  *     Zipf word table with natural shared substructure. This is the
  *     number that answers "minutes or hours at a GPT-class merge
  *     count": the distributed half is one aggregation measured by
  *     leg 1 and scales with the corpus, the loop scales with
  *     (vocab × merges) and is corpus-size-independent.
  *
  * Usage: `runMain graft.TrainBench [numMerges] [syntheticWords]
  * [byteLevel]`; prints one JSON line per leg. */
object TrainBench {
  def main(args: Array[String]): Unit = {
    GraftSession.warnHugeHeap("TrainBench")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val numMerges = args.headOption.map(_.toInt).getOrElse(32768)
    val syntheticWords = args.lift(1).map(_.toInt).getOrElse(100000)
    val byteLevel = args.lift(2).exists(_.toBoolean)
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(d: Double) = math.round(d * 1000) / 1000.0

    val docs = Tables(spark, sfDir).documents
    val (corpusMerges, corpusWall) = timed {
      graft.operators.Bpe.train(docs, "text", numMerges, byteLevel = byteLevel)
    }
    spark.stop()
    println(s"""{"metric":"bpe_train_corpus_sec","value":${fmt(corpusWall)},""" +
      s""""merges_requested":$numMerges,"merges_trained":${corpusMerges.size},""" +
      s""""byte_level":$byteLevel,"sf_dir":"${sfDir.takeRight(24)}"}""")

    // seeded Zipf word table: skewed letter draws + shared suffixes so
    // merge dynamics resemble natural text (deep chains, contested
    // pairs), counts ~ N/rank
    val rnd = new scala.util.Random(42L)
    val letters = "etaoinshrdlucmfwypvbgkqjxz"
    def draw(): Char = letters(math.min((math.pow(rnd.nextDouble(), 2.0) * 26).toInt, 25))
    val suffixes = Seq("", "s", "ing", "ed", "er", "ly", "tion", "ness")
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    while (seen.size < syntheticWords) {
      val stem = (0 until (3 + rnd.nextInt(6))).map(_ => draw()).mkString
      seen += stem + suffixes(rnd.nextInt(suffixes.size))
    }
    val words = seen.iterator.zipWithIndex
      .map { case (w, i) => (w, math.max(1L, (syntheticWords.toLong * 10) / (i + 1))) }
      .toArray
    val (synMerges, synWall) = timed {
      graft.operators.Bpe.trainFromWordCounts(words, numMerges)
    }
    println(s"""{"metric":"bpe_train_driver_loop_sec","value":${fmt(synWall)},""" +
      s""""merges_requested":$numMerges,"merges_trained":${synMerges.size},""" +
      s""""distinct_words":${words.length}}""")
  }
}
