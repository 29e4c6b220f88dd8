"""Sources/sinks: testdata tables, the images table, ordered sinks."""
