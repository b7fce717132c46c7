"""Local test harness mirroring the driver's oracle-differential check."""
