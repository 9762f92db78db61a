package graft.etl.ops

import graft.etl.QueryDef

object WindowOps {
  def defs: Seq[QueryDef] = Seq()
}
