package graft.etl.ops

import graft.etl.QueryDef

object ScalarOps {
  def defs: Seq[QueryDef] = Seq()
}
