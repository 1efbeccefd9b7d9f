package org.apache.datasketches.memory;

/**
 * Minimal heap-backed, little-endian stand-in for datasketches-memory's
 * Memory, covering only the accessors the reference's vendored KLL/REQ
 * serializers call. Written from the public API surface; not a copy.
 */
public class Memory {
    final byte[] arr;

    Memory(final byte[] arr) {
        this.arr = arr;
    }

    public static Memory wrap(final byte[] arr) {
        return new Memory(arr);
    }

    public long getCapacity() {
        return arr.length;
    }

    public byte getByte(final long off) {
        return arr[(int) off];
    }

    public short getShort(final long off) {
        return org.apache.datasketches.ByteArrayUtil.getShortLE(arr, (int) off);
    }

    public int getInt(final long off) {
        return org.apache.datasketches.ByteArrayUtil.getIntLE(arr, (int) off);
    }

    public long getLong(final long off) {
        return org.apache.datasketches.ByteArrayUtil.getLongLE(arr, (int) off);
    }

    public float getFloat(final long off) {
        return org.apache.datasketches.ByteArrayUtil.getFloatLE(arr, (int) off);
    }

    public double getDouble(final long off) {
        return org.apache.datasketches.ByteArrayUtil.getDoubleLE(arr, (int) off);
    }

    public void getIntArray(final long off, final int[] dst, final int dstOff, final int len) {
        for (int i = 0; i < len; i++) {
            dst[dstOff + i] = getInt(off + 4L * i);
        }
    }

    public void getDoubleArray(final long off, final double[] dst, final int dstOff, final int len) {
        for (int i = 0; i < len; i++) {
            dst[dstOff + i] = getDouble(off + 8L * i);
        }
    }

    public Buffer asBuffer() {
        return new Buffer(arr);
    }
}
