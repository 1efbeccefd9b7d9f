package org.apache.datasketches;

/**
 * Minimal stand-in for the datasketches-java Family enum: only the ids the
 * vendored KLL/REQ serializers reference. Ids are the published wire-format
 * constants (KLL=15, REQ=17).
 */
public enum Family {
    KLL(15),
    REQ(17);

    private final int id;

    Family(final int id) {
        this.id = id;
    }

    public int getID() {
        return id;
    }
}
