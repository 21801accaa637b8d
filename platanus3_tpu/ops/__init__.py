"""Array-native compute ops: k-mer bit math, hashing, Bloom, counting."""
