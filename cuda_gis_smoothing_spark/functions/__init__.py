"""Column-level functions: pixel codecs, geolocation, text analytics."""
