#!/bin/bash
# Run a scalatest suite with bare java (avoids sbt startup).
# group-scoped pattern: "*3.2.19*" alone would also pick up any
# UNRELATED library that happens to ship that version string in its
# coursier path, ahead of the intended jars
ST=$(find /root/.cache/coursier -path "*org/scalatest*" -path "*3.2.19*" -name "*.jar" | tr '\n' ':')
SCK=$(find /root/.cache/coursier -name "scalacheck_2.13-1.18.0.jar" | head -1)
SC=$(find /root/.cache/coursier -name "scalactic_2.13-3.2.19.jar" | head -1)
CP="/root/repo/target/scala-2.13/classes:/root/repo/target/scala-2.13/test-classes:/opt/spark/jars/*:$ST$SC:$SCK"
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -XX:+UseParallelGC -Xmx32g \
  -cp "$CP" org.scalatest.tools.Runner -R /root/repo/target/scala-2.13/test-classes -o "$@"
