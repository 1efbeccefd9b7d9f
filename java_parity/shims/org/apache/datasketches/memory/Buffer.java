package org.apache.datasketches.memory;

import org.apache.datasketches.ByteArrayUtil;

/**
 * Positional little-endian reader over a heap byte[]; minimal stand-in for
 * datasketches-memory's Buffer (only the methods the vendored serializers use).
 */
public class Buffer {
    final byte[] arr;
    long pos;

    Buffer(final byte[] arr) {
        this.arr = arr;
        this.pos = 0;
    }

    public long getPosition() {
        return pos;
    }

    public void incrementPosition(final long n) {
        pos += n;
    }

    public byte getByte() {
        return arr[(int) pos++];
    }

    public short getShort() {
        final short v = ByteArrayUtil.getShortLE(arr, (int) pos);
        pos += 2;
        return v;
    }

    public int getInt() {
        final int v = ByteArrayUtil.getIntLE(arr, (int) pos);
        pos += 4;
        return v;
    }

    public long getLong() {
        final long v = ByteArrayUtil.getLongLE(arr, (int) pos);
        pos += 8;
        return v;
    }

    public float getFloat() {
        final float v = ByteArrayUtil.getFloatLE(arr, (int) pos);
        pos += 4;
        return v;
    }

    public double getDouble() {
        final double v = ByteArrayUtil.getDoubleLE(arr, (int) pos);
        pos += 8;
        return v;
    }

    public void getDoubleArray(final double[] dst, final int dstOff, final int len) {
        for (int i = 0; i < len; i++) {
            dst[dstOff + i] = getDouble();
        }
    }
}
