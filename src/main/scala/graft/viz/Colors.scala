package graft.viz

/** Driver-side color math (reference `colors.py:13-71`): RGB<->HLS,
  * lightness ramps, sequential colormaps. Pure functions — they feed the
  * rendering layer, never touch a DataFrame.
  */
object Colors {

  /** RGB (0..1 each) -> (hue, lightness, saturation), colorsys semantics
    * (`colors.py:13-25` to_hls).
    */
  def toHls(r: Double, g: Double, b: Double): (Double, Double, Double) = {
    val maxc = math.max(r, math.max(g, b))
    val minc = math.min(r, math.min(g, b))
    val l = (minc + maxc) / 2.0
    if (minc == maxc) (0.0, l, 0.0)
    else {
      val delta = maxc - minc
      val s = if (l <= 0.5) delta / (maxc + minc) else delta / (2.0 - maxc - minc)
      val rc = (maxc - r) / delta
      val gc = (maxc - g) / delta
      val bc = (maxc - b) / delta
      val h0 =
        if (r == maxc) bc - gc
        else if (g == maxc) 2.0 + rc - bc
        else 4.0 + gc - rc
      val h = (h0 / 6.0) % 1.0
      (if (h < 0) h + 1.0 else h, l, s)
    }
  }

  /** HLS -> RGB (colorsys hls_to_rgb). */
  def hlsToRgb(h: Double, l: Double, s: Double): (Double, Double, Double) = {
    if (s == 0.0) (l, l, l)
    else {
      val m2 = if (l <= 0.5) l * (1.0 + s) else l + s - l * s
      val m1 = 2.0 * l - m2
      def v(hue0: Double): Double = {
        var hue = hue0 % 1.0
        if (hue < 0) hue += 1.0
        if (hue < 1.0 / 6.0) m1 + (m2 - m1) * hue * 6.0
        else if (hue < 0.5) m2
        else if (hue < 2.0 / 3.0) m1 + (m2 - m1) * (2.0 / 3.0 - hue) * 6.0
        else m1
      }
      (v(h + 1.0 / 3.0), v(h), v(h - 1.0 / 3.0))
    }
  }

  /** Lighten by moving lightness toward 1 by `amount` in [0,1]
    * (`colors.py:28-42` lighten).
    */
  def lighten(r: Double, g: Double, b: Double, amount: Double): (Double, Double, Double) = {
    val (h, l, s) = toHls(r, g, b)
    hlsToRgb(h, l + (1.0 - l) * amount, s)
  }

  /** Sequential colormap: `n` stops ramping the base color's lightness
    * (`colors.py:45-71` sequential_cmap via linspace).
    */
  def sequentialCmap(r: Double, g: Double, b: Double, n: Int,
      loLight: Double = 0.9, hiLight: Double = 0.0): Seq[(Double, Double, Double)] = {
    require(n > 0)
    (0 until n).map { i =>
      val t = if (n == 1) 0.0 else i.toDouble / (n - 1)
      lighten(r, g, b, loLight + (hiLight - loLight) * t)
    }
  }
}
