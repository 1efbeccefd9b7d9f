package org.apache.datasketches.memory;

/** Writable variant of the Memory shim. */
public class WritableMemory extends Memory {
    WritableMemory(final byte[] arr) {
        super(arr);
    }

    public static WritableMemory wrap(final byte[] arr) {
        return new WritableMemory(arr);
    }

    public WritableBuffer asWritableBuffer() {
        return new WritableBuffer(arr);
    }
}
