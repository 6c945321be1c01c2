package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Caller-supplied column-name resolution for every library-form
  * operator: backtick-quote the identifier for `col`, so names
  * containing dots, spaces, or keywords resolve as plain columns
  * instead of being parsed as nested-field paths.
  */
private[operators] object Cols {
  def q(name: String): Column = col("`" + name.replace("`", "``") + "`")
}
