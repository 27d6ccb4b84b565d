package graft

import java.awt.image.BufferedImage
import java.util.concurrent.atomic.AtomicInteger

/** Fake javacv surface for the [[graft.multimodal.MultimodalOps.ReflectiveVideoBackend]]
  * seam spec: classes with EXACTLY the reflective shape the backend
  * probes for (FFmpegFrameGrabber(InputStream) / start / grabImage /
  * stop / release, Java2DFrameConverter().getBufferedImage(Frame)) so
  * the lifecycle plumbing executes in CI — no javacv jars exist in
  * this sandbox, and an untested reflective path fails silently into
  * the stub on any typo. */
object FakeJavacv {
  val started = new AtomicInteger(0)
  val stopped = new AtomicInteger(0)
  val released = new AtomicInteger(0)
  def reset(): Unit = { started.set(0); stopped.set(0); released.set(0) }

  /** Stands in for org.bytedeco.javacv.Frame. */
  class Frame(val idx: Int)

  /** Yields `totalFrames` frames then null; counts lifecycle calls. */
  class Grabber(in: java.io.InputStream) {
    private var i = 0
    protected def totalFrames: Int = 5
    def start(): Unit = { started.incrementAndGet(); () }
    def grabImage(): Frame =
      if (i < totalFrames) { i += 1; new Frame(i - 1) } else null
    def stop(): Unit = { stopped.incrementAndGet(); () }
    def release(): Unit = { released.incrementAndGet(); () }
  }

  /** Throws mid-stream: the backend must map the failure to None AND
    * still release the grabber (the finally contract). */
  class ThrowingGrabber(in: java.io.InputStream) extends Grabber(in) {
    private var calls = 0
    override def grabImage(): Frame = {
      calls += 1
      if (calls > 2) throw new RuntimeException("decode blew up mid-grab")
      new Frame(calls - 1)
    }
  }

  /** Stands in for Java2DFrameConverter: one red 2x2 image per frame. */
  class Converter {
    def getBufferedImage(f: Frame): BufferedImage = {
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      (0 until 2).foreach(x => (0 until 2).foreach(y =>
        img.setRGB(x, y, 0xff0000)))
      img
    }
  }

  /** A loader mapping the javacv class names onto the fakes. */
  def loader(grabber: Class[_]): String => Class[_] = {
    case "org.bytedeco.javacv.FFmpegFrameGrabber" => grabber
    case "org.bytedeco.javacv.Java2DFrameConverter" => classOf[Converter]
    case "org.bytedeco.javacv.Frame" => classOf[Frame]
    case other => throw new ClassNotFoundException(other)
  }
}
