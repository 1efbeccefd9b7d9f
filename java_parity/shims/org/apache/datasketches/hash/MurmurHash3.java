package org.apache.datasketches.hash;

/**
 * Stub satisfying an unused `import static ...MurmurHash3.hash` in the
 * reference's vendored datasketches Util. Never called on any code path the
 * parity harness exercises; throws if it ever is.
 */
public final class MurmurHash3 {
    private MurmurHash3() {}

    public static long[] hash(final long[] key, final long seed) {
        throw new UnsupportedOperationException("MurmurHash3 stub: not used by the parity harness");
    }
}
