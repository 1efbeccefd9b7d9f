package org.apache.datasketches;

/**
 * Minimal stand-in for the datasketches-java ByteArrayUtil used by the
 * reference's vendored KLL/REQ serializers (little-endian primitive codecs).
 * Written from the public API surface only; NOT a copy of the Apache class.
 */
public final class ByteArrayUtil {
    private ByteArrayUtil() {}

    public static void putShortLE(final byte[] a, final int off, final short v) {
        a[off] = (byte) v;
        a[off + 1] = (byte) (v >>> 8);
    }

    public static short getShortLE(final byte[] a, final int off) {
        return (short) ((a[off] & 0xFF) | ((a[off + 1] & 0xFF) << 8));
    }

    public static void putIntLE(final byte[] a, final int off, final int v) {
        a[off] = (byte) v;
        a[off + 1] = (byte) (v >>> 8);
        a[off + 2] = (byte) (v >>> 16);
        a[off + 3] = (byte) (v >>> 24);
    }

    public static int getIntLE(final byte[] a, final int off) {
        return (a[off] & 0xFF) | ((a[off + 1] & 0xFF) << 8)
                | ((a[off + 2] & 0xFF) << 16) | ((a[off + 3] & 0xFF) << 24);
    }

    public static void putLongLE(final byte[] a, final int off, final long v) {
        for (int i = 0; i < 8; i++) {
            a[off + i] = (byte) (v >>> (8 * i));
        }
    }

    public static long getLongLE(final byte[] a, final int off) {
        long v = 0;
        for (int i = 0; i < 8; i++) {
            v |= (a[off + i] & 0xFFL) << (8 * i);
        }
        return v;
    }

    public static void putFloatLE(final byte[] a, final int off, final float v) {
        putIntLE(a, off, Float.floatToRawIntBits(v));
    }

    public static float getFloatLE(final byte[] a, final int off) {
        return Float.intBitsToFloat(getIntLE(a, off));
    }

    public static void putDoubleLE(final byte[] a, final int off, final double v) {
        putLongLE(a, off, Double.doubleToRawLongBits(v));
    }

    public static double getDoubleLE(final byte[] a, final int off) {
        return Double.longBitsToDouble(getLongLE(a, off));
    }
}
