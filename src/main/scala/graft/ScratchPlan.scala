package graft

// TEMPORARY optimization-round scratch tool - not part of the library.
object ScratchPlan {
  def main(args: Array[String]): Unit = {
    import graft.text.Multimodal.WavCodec
    val clips = (0 until 500).map { i =>
      WavCodec.encodeWav(4000 + (i % 37) * 100, 8000, i.toLong)
    }.toArray

    def bench(label: String, f: Array[Byte] => Long): Unit = {
      def runWith(threads: Int): Double = {
        val t0 = System.nanoTime()
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        val futs = clips.map(c => pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = { var acc = 0L; var k = 0; while (k < 8) { acc += f(c); k += 1 }; acc }
        }))
        futs.foreach(_.get())
        pool.shutdown()
        (System.nanoTime() - t0) / 1e9
      }
      clips.take(50).foreach(f)
      println(f"[scratch] $label: 1t ${runWith(1)}%.3f s, 32t ${runWith(32)}%.3f s, 32t ${runWith(32)}%.3f s")
    }

    bench("meta", c => WavCodec.audioMetadata(c).map(_._4).getOrElse(-1L))
    bench("sum ", c => WavCodec.sampleSum(c).getOrElse(-1L))
  }
}
