// One-off golden generator for Adam7-interlaced and palette PNGs using the
// JDK's ImageIO PNG plugin (independent codec implementation). Same LCG
// pattern convention as MakeGolden.java.
import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.*;
import java.util.*;

public class MakeInterlaced {
    static long state = 0x2545F4914F6CDD1DL;
    static int nextByte() {
        state = state * 6364136223846793005L + 1442695040888963407L;
        return (int) ((state >>> 33) & 0xFF);
    }
    public static void main(String[] a) throws Exception {
        String out = a[0];
        // 1) Adam7 interlaced RGB noise 13x11 (odd dims stress pass edges)
        BufferedImage img = new BufferedImage(13, 11, BufferedImage.TYPE_INT_RGB);
        for (int y = 0; y < 11; y++)
            for (int x = 0; x < 13; x++)
                img.setRGB(x, y, (nextByte() << 16) | (nextByte() << 8) | nextByte());
        ImageWriter w = ImageIO.getImageWritersByFormatName("png").next();
        ImageWriteParam p = w.getDefaultWriteParam();
        p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT); // Adam7
        try (ImageOutputStream os = ImageIO.createImageOutputStream(
                new File(out + "/jdk_ilace.png"))) {
            w.setOutput(os);
            w.write(null, new IIOImage(img, null, null), p);
        }
        // decode back with the JDK itself and dump RGB
        BufferedImage back = ImageIO.read(new File(out + "/jdk_ilace.png"));
        try (DataOutputStream o = new DataOutputStream(
                new FileOutputStream(out + "/jdk_ilace.png.rgb"))) {
            for (int y = 0; y < back.getHeight(); y++)
                for (int x = 0; x < back.getWidth(); x++) {
                    int v = back.getRGB(x, y);
                    o.writeByte((v >> 16) & 0xFF);
                    o.writeByte((v >> 8) & 0xFF);
                    o.writeByte(v & 0xFF);
                }
        }
        // 2) palette PNG: TYPE_BYTE_INDEXED writes a PLTE chunk
        BufferedImage pal = new BufferedImage(9, 7, BufferedImage.TYPE_BYTE_INDEXED);
        for (int y = 0; y < 7; y++)
            for (int x = 0; x < 9; x++)
                pal.setRGB(x, y, (nextByte() << 16) | (nextByte() << 8) | nextByte());
        ImageIO.write(pal, "png", new File(out + "/jdk_palette.png"));
        BufferedImage back2 = ImageIO.read(new File(out + "/jdk_palette.png"));
        try (DataOutputStream o = new DataOutputStream(
                new FileOutputStream(out + "/jdk_palette.png.rgb"))) {
            for (int y = 0; y < back2.getHeight(); y++)
                for (int x = 0; x < back2.getWidth(); x++) {
                    int v = back2.getRGB(x, y);
                    o.writeByte((v >> 16) & 0xFF);
                    o.writeByte((v >> 8) & 0xFF);
                    o.writeByte(v & 0xFF);
                }
        }
        System.out.println("ok");
    }
}
