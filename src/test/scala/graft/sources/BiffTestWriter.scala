package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Independent BIFF8/CFB byte-level WRITERS for specs (deliberately not
  * the reader's own code): BiffReaderSpec builds record-kind coverage
  * workbooks with these, and MatchQualitySpec round-trips the reference
  * seed sheet through a generated .xls to prove the S2 (xlsx) and S2b
  * (xls) readers interchangeable on the same data. */
object BiffTestWriter {

  def le(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
  def u16(v: Int): Array[Byte] =
    Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  def i32(v: Int): Array[Byte] = Array[Byte](
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  def f64(v: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.putDouble(v); b.array()
  }
  def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    le(u16(id), u16(payload.length), payload)

  /** BIFF8 16-bit-count unicode string; compressed (Latin-1) when the
    * text fits, wide UTF-16LE otherwise — real writers pick the same way. */
  def ustr(s: String): Array[Byte] =
    if (s.forall(_ <= 0xFF))
      le(u16(s.length), Array[Byte](0), s.getBytes("ISO-8859-1"))
    else
      le(u16(s.length), Array[Byte](1), s.getBytes("UTF-16LE"))

  def cellHead(row: Int, colIdx: Int, ixfe: Int): Array[Byte] =
    le(u16(row), u16(colIdx), u16(ixfe))

  /** FORMULA record: cached value + flags + chn + empty rgce. */
  def formulaRec(row: Int, c: Int, ixfe: Int, value: Array[Byte]): Array[Byte] =
    rec(0x0006, le(cellHead(row, c, ixfe), value, u16(0), i32(0), u16(0)))

  /** Tagged non-numeric FormulaValue: tag byte, value at byte 2, 0xFFFF tail. */
  def fval(tag: Int, v: Int): Array[Byte] =
    le(Array[Byte](tag.toByte, 0, v.toByte, 0, 0, 0), u16(0xFFFF))

  /** A complete workbook stream around caller-supplied raw sheet cell
    * records; `bofVersion` is overridable so the BIFF5 typed-reject
    * path can be pinned (0x0500 = Excel 5.0/95). */
  def rawWorkbook(cellRecs: Seq[Array[Byte]],
      bofVersion: Int = 0x0600): Array[Byte] = {
    def globals(sheetPos: Int): Array[Byte] = le(
      rec(0x0809, le(u16(bofVersion), u16(0x0005), u16(0), u16(0), i32(0), i32(0))),
      rec(0x00E0, le(u16(0), u16(0), new Array[Byte](16))),
      rec(0x0085, le(i32(sheetPos), u16(0),
        Array[Byte](2, 0), "S1".getBytes("ISO-8859-1"))),
      rec(0x000A, Array.empty[Byte]))
    val sheet = le(
      (rec(0x0809, le(u16(bofVersion), u16(0x0010), u16(0), u16(0), i32(0), i32(0)))
        +: cellRecs :+ rec(0x000A, Array.empty[Byte])): _*)
    val g = globals(0)
    globals(g.length) ++ sheet
  }

  /** A complete workbook stream of inline-LABEL string cells: row 0 is
    * the header, every cell is a LABEL — the generic "any grid of
    * strings as .xls" writer. */
  def labelsWorkbook(rows: Seq[Seq[String]]): Array[Byte] =
    rawWorkbook(rows.zipWithIndex.flatMap { case (cols, r) =>
      cols.zipWithIndex.collect { case (v, c) if v != null =>
        rec(0x0204, le(cellHead(r, c, 0), ustr(v)))
      }
    })

  /** A valid CFB v3 container around a workbook stream: one FAT sector,
    * one directory sector, N stream sectors (regular FAT — streams under
    * the 4096-byte mini cutoff are padded up to it so the mini-stream
    * machinery is never needed). Single-FAT-sector layout caps the
    * stream at 126 sectors (~63 KB) — plenty for spec fixtures. */
  def buildCfb(wb: Array[Byte]): Array[Byte] = {
    val nWb = math.max(8, (wb.length + 511) / 512)
    require(nWb <= 126, s"test stream needs $nWb sectors > 126 (one FAT sector)")
    // header + FAT sector + directory sector + the stream sectors
    val buf = ByteBuffer.allocate(512 * (3 + nWb)).order(ByteOrder.LITTLE_ENDIAN)
    val End = 0xFFFFFFFE; val Free = 0xFFFFFFFF
    buf.putLong(0, 0xE11AB1A1E011CFD0L)
    buf.putShort(24, 0x3E.toShort); buf.putShort(26, 3)
    buf.putShort(28, 0xFFFE.toShort)
    buf.putShort(30, 9); buf.putShort(32, 6)
    buf.putInt(44, 1)        // one FAT sector
    buf.putInt(48, 1)        // directory starts at sector 1
    buf.putInt(56, 4096)     // mini-stream cutoff
    buf.putInt(60, End)      // no miniFAT
    buf.putInt(68, End); buf.putInt(72, 0) // no DIFAT chain
    buf.putInt(76, 0)        // DIFAT[0]: FAT lives in sector 0
    (1 until 109).foreach(i => buf.putInt(76 + i * 4, Free))
    // FAT (sector 0): s0=FATSECT, s1=dir end, s2.. workbook chain
    buf.putInt(512, 0xFFFFFFFD)
    buf.putInt(516, End)
    (0 until nWb).foreach(i =>
      buf.putInt(520 + i * 4, if (i == nWb - 1) End else 3 + i))
    (2 + nWb until 128).foreach(i => buf.putInt(512 + i * 4, Free))
    // directory (sector 1): Root Entry + Workbook
    def dirEntry(slot: Int, name: String, objType: Int, start: Int, size: Int): Unit = {
      val base = 1024 + slot * 128
      val nb = name.getBytes("UTF-16LE")
      nb.indices.foreach(i => buf.put(base + i, nb(i)))
      buf.putShort(base + 64, ((name.length + 1) * 2).toShort)
      buf.put(base + 66, objType.toByte)
      buf.putInt(base + 68, Free); buf.putInt(base + 72, Free)
      buf.putInt(base + 76, if (slot == 0) 1 else Free)
      buf.putInt(base + 116, start)
      buf.putInt(base + 120, size)
    }
    dirEntry(0, "Root Entry", 5, End, 0)
    dirEntry(1, "Workbook", 2, 2, math.max(wb.length, 4096))
    // workbook stream in sectors 2..
    wb.indices.foreach(i => buf.put(1024 + 512 + i, wb(i)))
    buf.array()
  }
}
