package graft.fm

import graft.{QueryDef, Tables}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** The reference Sample app's feature-engineering pipeline
  * (FactorizationMachinesSample.scala:75-128) rebuilt over our fixtures:
  * a genuine relational query — project → group-agg(collect_set) →
  * explode → string split/cast — followed by the U9 sparse-vector
  * encoding `[user one-hot | movie one-hot | other-rated-movies 1/(n-1)]`
  * (Sample:76-95).
  *
  * MovieLens isn't shipped; ratings derive deterministically from the
  * `events` fixture (FIXTURES.md §1.4) with pure integer arithmetic so
  * the relational part is DuckDB-oracle-checkable.
  */
object SamplePipeline {

  /** Deterministic MovieLens-ish ratings from events: one (user, movie)
    * rating in {0.5, 1.0, …, 4.5}. */
  def ratingsFromEvents(events: DataFrame): DataFrame =
    events
      .select(
        (pmod(col("user_id"), lit(100)) + 1).cast(IntegerType).as("userId"),
        (pmod(col("event_id"), lit(50)) + 1).cast(IntegerType).as("movieId"),
        ((pmod(col("event_id") * 7 + col("user_id"), lit(9)) + 1)
          .cast(DoubleType) / 2.0).as("rating"))
      .groupBy(col("userId"), col("movieId"))
      .agg(max(col("rating")).as("rating"))

  /** The relational half of Sample:104-123: per-user rating set, exploded
    * back to rows with split/cast. Keeps `movieRatings` for the encoder. */
  def explodedRatings(ratings: DataFrame): DataFrame =
    ratings
      .select(col("userId"),
        concat(col("movieId"), lit(":"), col("rating")).as("movieRating"))
      .groupBy(col("userId"))
      .agg(collect_set(col("movieRating")).as("movieRatings"))
      .select(col("userId"), col("movieRatings"),
        explode(col("movieRatings")).as("movieRating"))
      .select(
        col("userId"),
        col("movieRatings"),
        split(col("movieRating"), ":")(0).cast(IntegerType).as("movieId"),
        split(col("movieRating"), ":")(1).cast(DoubleType).as("rating"))

  /** U9 `udfCrateFeatureVec` (sic) — Sample:76-95 semantics exactly:
    * dimension = maxUserId + 2·maxMovieId; user one-hot at `userId`,
    * current movie one-hot at `maxUserId + movieId`, every *other* rated
    * movie at `maxUserId + maxMovieId + otherId` with weight `1/(n−1)`
    * where n counts ALL the user's ratings (including the current one). */
  def buildFeatures(ratings: DataFrame, maxUserId: Int, maxMovieId: Int): DataFrame = {
    // The encoding writes "other movie" features at
    // maxUserId + maxMovieId + movieId, which equals the vector dimension
    // when movieId == maxMovieId — so the pools must STRICTLY exceed
    // every id. (The reference has the same latent overflow; MovieLens
    // never triggers it because its real max id is below the constant.)
    val encode = udf { (userId: Int, movieRatings: Seq[String], currentMovie: Int) =>
      require(userId < maxUserId && currentMovie < maxMovieId,
        s"ids must be strictly below the pools: user $userId/$maxUserId, " +
          s"movie $currentMovie/$maxMovieId")
      val ratingMap = if (movieRatings.size < 2) {
        Map.empty[Int, Double]
      } else {
        val w = 1.0 / (movieRatings.size - 1.0)
        movieRatings
          .map(_.split(":")(0).toInt)
          .filter(_ != currentMovie)
          .map(m => (maxUserId + maxMovieId + m, w))
          .toMap
      }
      val featureMap =
        ratingMap + (userId -> 1.0) + ((maxUserId + currentMovie) -> 1.0)
      Vectors.sparse(maxUserId + 2 * maxMovieId, featureMap.toSeq)
    }
    explodedRatings(ratings).select(
      col("rating").as("label"),
      encode(col("userId"), col("movieRatings"), col("movieId")).as("features"))
  }

  /** Oracle-checked query for the relational part (concat → collect_set →
    * explode → split → cast — A7/G2 + §2.9 string ops). */
  val sampleFeaturesRelational: QueryDef = QueryDef.sql(
    "fm_sample_features_relational",
    """WITH ratings AS (
      |  SELECT userId, movieId, max(rating) AS rating FROM (
      |    SELECT CAST(user_id % 100 + 1 AS INT) AS userId,
      |           CAST(event_id % 50 + 1 AS INT) AS movieId,
      |           CAST((event_id*7 + user_id) % 9 + 1 AS DOUBLE)/2.0 AS rating
      |    FROM events) r GROUP BY userId, movieId),
      |sets AS (
      |  SELECT userId, list(DISTINCT concat(movieId, ':', rating)) AS movieRatings
      |  FROM ratings GROUP BY userId),
      |exploded AS (
      |  SELECT userId, len(movieRatings) AS n_rated,
      |         unnest(movieRatings) AS movieRating
      |  FROM sets)
      |SELECT userId,
      |  CAST(string_split(movieRating, ':')[1] AS INT) AS movieId,
      |  CAST(string_split(movieRating, ':')[2] AS DOUBLE) AS rating,
      |  n_rated
      |FROM exploded
      |ORDER BY userId, movieId, rating""".stripMargin) { (s, d) =>
    val ratings = ratingsFromEvents(Tables.events(s, d))
    explodedRatings(ratings)
      .select(col("userId"), col("movieId"), col("rating"),
        size(col("movieRatings")).cast("long").as("n_rated"))
      .orderBy(col("userId"), col("movieId"), col("rating"))
  }

  val all: Seq[QueryDef] = Seq(sampleFeaturesRelational)
}
