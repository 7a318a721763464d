package graft.plans

import org.apache.spark.sql.types._

/** Shared partition-STAMP comparator for range conjuncts on a file's
  * partition column: compares a stamp string against a literal in the
  * COLUMN's own semantics — `UTF8String` binary order for strings
  * (Spark's, NOT `java.lang.String`'s UTF-16 order, which disagrees
  * beyond the BMP), numeric for integral columns (lexicographic would
  * put '10' below '2' and admit files whose rows all fail the
  * filter). `None` at the outer level = the type carries no provable
  * stamp order (refuse); `None` from the returned function = this
  * stamp cannot stand for a value of the column's type
  * (partition-evolved layout — the caller decides whether that drops
  * the file or refuses the rewrite).
  */
private[plans] object StampOrder {
  def cmp(dt: DataType, litValue: Any): Option[String => Option[Int]] =
    (dt, litValue) match {
      case (StringType, u: org.apache.spark.unsafe.types.UTF8String) =>
        Some(s => Some(org.apache.spark.unsafe.types.UTF8String
          .fromString(s).compareTo(u)))
      case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
        val l = n.longValue()
        Some(s => try Some(java.lang.Long.compare(s.toLong, l))
          catch { case _: NumberFormatException => None })
      case _ => None
    }
}
