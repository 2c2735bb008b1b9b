package graft

import graft.queries._

/** Registry of every verified query the engine ships. SparkEntry
  * derives the driver-contract maps from this single list.
  */
object Queries {
  val all: Seq[QuerySpec] =
    RelationalQueries.specs ++ WindowQueries.specs ++ TextQueries.specs ++
      DedupQueries.specs ++ SimilarityQueries.specs ++ EventQueries.specs ++
      ScalarQueries.specs ++ ProtocolQueries.specs ++ MultimodalQueries.specs

  lazy val byName: Map[String, QuerySpec] =
    all.map(q => q.name -> q).toMap

  require(all.map(_.name).distinct.length == all.length,
    "duplicate query names in registry")
}
