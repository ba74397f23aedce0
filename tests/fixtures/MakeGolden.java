// Golden-fixture generator: encodes deterministic pixel patterns with the
// JDK's ImageIO (an independent, widely-deployed codec implementation -
// the JPEG plugin wraps a libjpeg-derived encoder/decoder) and dumps, for
// each format, the encoded bytes plus the pixels THE JDK ITSELF decodes
// back from those bytes. The repo's pure-Python decoders are then asserted
// against these files in tests/test_golden_fixtures.py: byte-exact for
// lossless formats, bounded-error for JPEG. Regenerate with:
//   javac MakeGolden.java && java MakeGolden <outdir>
// Patterns are seeded LCGs - no RNG state, fully reproducible.
import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.*;

public class MakeGolden {
    // xorshift-free explicit LCG so the pattern is reproducible anywhere
    static long state = 0x2545F4914F6CDD1DL;
    static int nextByte() {
        state = state * 6364136223846793005L + 1442695040888963407L;
        return (int) ((state >>> 33) & 0xFF);
    }

    static BufferedImage pattern(int w, int h, boolean color, boolean smooth) {
        BufferedImage img = new BufferedImage(
            w, h, color ? BufferedImage.TYPE_INT_RGB : BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r, g, b;
                if (smooth) { // gradients compress gently: good for lossy bounds
                    r = (x * 255) / Math.max(w - 1, 1);
                    g = (y * 255) / Math.max(h - 1, 1);
                    b = ((x + y) * 255) / Math.max(w + h - 2, 1);
                } else {      // seeded noise: exercises entropy coding hard
                    r = nextByte(); g = nextByte(); b = nextByte();
                }
                if (!color) {
                    // raw sample write: getRGB/setRGB on TYPE_BYTE_GRAY
                    // round-trips through a linear-gray<->sRGB conversion
                    // that distorts values; raster access is identity
                    img.getRaster().setSample(x, y, 0, (r + g + b) / 3);
                } else {
                    img.setRGB(x, y, (r << 16) | (g << 8) | b);
                }
            }
        return img;
    }

    static void writeRaster(BufferedImage img, String path) throws IOException {
        // raw interleaved RGB (or single-channel gray) rows, top-down
        try (DataOutputStream o = new DataOutputStream(new FileOutputStream(path))) {
            boolean gray = img.getRaster().getNumBands() == 1;
            for (int y = 0; y < img.getHeight(); y++)
                for (int x = 0; x < img.getWidth(); x++) {
                    if (gray) {
                        // raw sample read - see pattern(): no colorspace math
                        o.writeByte(img.getRaster().getSample(x, y, 0));
                    } else {
                        int p = img.getRGB(x, y);
                        o.writeByte((p >> 16) & 0xFF);
                        o.writeByte((p >> 8) & 0xFF);
                        o.writeByte(p & 0xFF);
                    }
                }
        }
    }

    static byte[] encode(BufferedImage img, String fmt, float q) throws IOException {
        return encode(img, fmt, q, false);
    }

    static byte[] encode(BufferedImage img, String fmt, float q,
                         boolean progressive) throws IOException {
        ByteArrayOutputStream bos = new ByteArrayOutputStream();
        ImageWriter w = ImageIO.getImageWritersByFormatName(fmt).next();
        ImageWriteParam p = w.getDefaultWriteParam();
        if (q > 0) { p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
                     p.setCompressionQuality(q); }
        if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        try (ImageOutputStream ios = ImageIO.createImageOutputStream(bos)) {
            w.setOutput(ios);
            w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
        return bos.toByteArray();
    }

    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        dir.mkdirs();

        // --- lossless: PNG, BMP, GIF(gray: palette == 256 grays, exact)
        BufferedImage noise = pattern(37, 23, true, false);
        BufferedImage grad  = pattern(48, 32, true, true);
        BufferedImage gray  = pattern(33, 21, false, true);

        try (FileOutputStream f = new FileOutputStream(new File(dir, "jdk_noise.png"))) { f.write(encode(noise, "png", -1)); }
        writeRaster(noise, new File(dir, "jdk_noise.png.rgb").getPath());
        try (FileOutputStream f = new FileOutputStream(new File(dir, "jdk_grad.bmp"))) { f.write(encode(grad, "bmp", -1)); }
        writeRaster(grad, new File(dir, "jdk_grad.bmp.rgb").getPath());
        byte[] gifb = encode(gray, "gif", -1);
        try (FileOutputStream f = new FileOutputStream(new File(dir, "jdk_gray.gif"))) { f.write(gifb); }
        BufferedImage gifBack = ImageIO.read(new ByteArrayInputStream(gifb));
        writeRaster(gifBack, new File(dir, "jdk_gray.gif.rgb").getPath());

        // --- lossy JPEG: gray 4:4:4-ish single component, color (JDK
        // writes 4:2:0 for RGB by default). Golden = what the JDK's OWN
        // decoder reconstructs from the exact bytes on disk.
        BufferedImage jg = pattern(40, 24, false, true);
        byte[] jgray = encode(jg, "jpg", 0.9f);
        try (FileOutputStream f = new FileOutputStream(new File(dir, "jdk_gray.jpg"))) { f.write(jgray); }
        BufferedImage jgBack = ImageIO.read(new ByteArrayInputStream(jgray));
        writeRaster(jgBack, new File(dir, "jdk_gray.jpg.rgb").getPath());

        BufferedImage jc = pattern(41, 25, true, true);
        byte[] jcol = encode(jc, "jpg", 0.85f);
        try (FileOutputStream f = new FileOutputStream(new File(dir, "jdk_color.jpg"))) { f.write(jcol); }
        BufferedImage jcBack = ImageIO.read(new ByteArrayInputStream(jcol));
        writeRaster(jcBack, new File(dir, "jdk_color.jpg.rgb").getPath());

        // progressive 4:2:0 color JPEG (the dominant real-crawl form)
        BufferedImage jp = pattern(43, 27, true, true);
        byte[] jprog = encode(jp, "jpg", 0.85f, true);
        try (FileOutputStream f = new FileOutputStream(new File(dir, "jdk_color_prog.jpg"))) { f.write(jprog); }
        BufferedImage jpBack = ImageIO.read(new ByteArrayInputStream(jprog));
        writeRaster(jpBack, new File(dir, "jdk_color_prog.jpg.rgb").getPath());

        // --- WAV via javax.sound: 16-bit PCM mono sine-ish LCG samples
        int n = 777, rate = 8000;
        byte[] pcm = new byte[n * 2];
        for (int i = 0; i < n; i++) {
            int v = (int) Math.round(12000 * Math.sin(2 * Math.PI * 440 * i / rate))
                    + (nextByte() - 128);
            pcm[2 * i] = (byte) (v & 0xFF); pcm[2 * i + 1] = (byte) ((v >> 8) & 0xFF);
        }
        javax.sound.sampled.AudioFormat af =
            new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false);
        javax.sound.sampled.AudioInputStream ais =
            new javax.sound.sampled.AudioInputStream(
                new ByteArrayInputStream(pcm), af, n);
        javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE,
            new File(dir, "jdk_tone.wav"));
        try (FileOutputStream f = new FileOutputStream(new File(dir, "jdk_tone.wav.pcm"))) { f.write(pcm); }

        System.out.println("wrote fixtures to " + dir);
    }
}
