package graft.viz

/** Balanced subplot grid math (reference `matplotlib/utils.py:12-75`
  * grid_size / grid_axes). Pure driver-side helpers for the rendering
  * layer.
  */
object GridUtils {

  /** (rows, cols) for n panels: near-square, wide-first — ceil(sqrt(n))
    * columns, as many rows as needed (`matplotlib/utils.py:12-34`).
    */
  def gridSize(n: Int, maxCols: Int = Int.MaxValue): (Int, Int) = {
    require(n >= 0)
    if (n == 0) (0, 0)
    else {
      val cols = math.min(math.ceil(math.sqrt(n)).toInt, maxCols)
      val rows = math.ceil(n.toDouble / cols).toInt
      (rows, cols)
    }
  }

  /** Panel index -> (row, col) positions for n panels. */
  def gridPositions(n: Int, maxCols: Int = Int.MaxValue): Seq[(Int, Int)] = {
    val (_, cols) = gridSize(n, maxCols)
    (0 until n).map(i => (i / cols, i % cols))
  }
}
