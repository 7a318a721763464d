package graft

class TablesSpec extends SparkSpec {

  test("staged rich corpus is row-identical to the defining expression") {
    val derived = Tables.richDocuments(spark, sfDir)
    val staged = Tables.richDocumentsStaged(spark, sfDir)
    assert(staged.schema === derived.schema)
    assert(staged.count() === derived.count())
    assert(staged.exceptAll(derived).count() === 0L)
    assert(derived.exceptAll(staged).count() === 0L)
  }

  test("staging is reused: second read touches the same files") {
    val a = Tables.richDocumentsStaged(spark, sfDir).inputFiles.sorted.toSeq
    val b = Tables.richDocumentsStaged(spark, sfDir).inputFiles.sorted.toSeq
    assert(a.nonEmpty && a === b)
  }
}
