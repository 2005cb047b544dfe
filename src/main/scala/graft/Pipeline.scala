package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Large-scale training-data pipeline operators (dedup, similarity search,
  * text analysis, multimodal) over the documents/embeddings tables. */
object Pipeline {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
