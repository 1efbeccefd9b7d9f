package org.apache.datasketches.memory;

import org.apache.datasketches.ByteArrayUtil;

/** Positional little-endian writer over a heap byte[]; minimal stand-in. */
public class WritableBuffer extends Buffer {
    WritableBuffer(final byte[] arr) {
        super(arr);
    }

    public void putByte(final byte v) {
        arr[(int) pos++] = v;
    }

    public void putShort(final short v) {
        ByteArrayUtil.putShortLE(arr, (int) pos, v);
        pos += 2;
    }

    public void putInt(final int v) {
        ByteArrayUtil.putIntLE(arr, (int) pos, v);
        pos += 4;
    }

    public void putLong(final long v) {
        ByteArrayUtil.putLongLE(arr, (int) pos, v);
        pos += 8;
    }

    public void putFloat(final float v) {
        ByteArrayUtil.putFloatLE(arr, (int) pos, v);
        pos += 4;
    }

    public void putDouble(final double v) {
        ByteArrayUtil.putDoubleLE(arr, (int) pos, v);
        pos += 8;
    }

    public void putByteArray(final byte[] src, final int srcOff, final int len) {
        System.arraycopy(src, srcOff, arr, (int) pos, len);
        pos += len;
    }

    public void putDoubleArray(final double[] src, final int srcOff, final int len) {
        for (int i = 0; i < len; i++) {
            putDouble(src[srcOff + i]);
        }
    }
}
