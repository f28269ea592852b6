# Shared JDK17 --add-opens list for driver JVMs launched outside sbt.
# ONE definition (mirrors PseudoCluster.scala's executor-side list) so
# the driver and executor module environments cannot silently diverge.
# Usage: source tools/jvm_opens.sh   (sets $ADDOPENS)
ADDOPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
  sun.security.action sun.util.calendar; do printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done)
export ADDOPENS
