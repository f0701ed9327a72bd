package graft

/** Java-serializable wrapper around a Hadoop `Configuration` (which is
  * Writable but not Serializable), for shipping the SESSION's hadoop conf
  * to executors. Executor-side `new Configuration()` loads only the
  * classpath defaults and drops every `spark.hadoop.*` session setting —
  * fs.defaultFS overrides, s3a credentials — so a "writes land on the
  * shared store" claim silently breaks on a cluster configured via Spark
  * conf (round-12 advisory). Same Writable-round-trip shape as Spark's
  * own `org.apache.spark.util.SerializableConfiguration`, which is
  * `private[spark]` and therefore re-declared here.
  *
  * ASSUMES the JavaSerializer (Spark's default for closures/broadcasts):
  * the writeObject/readObject hooks below are Java-serialization
  * callbacks, and a session running `spark.serializer=KryoSerializer`
  * would bypass them — unregistered Kryo field-serializes the Hadoop
  * `Configuration` and fails (round-13 advisory; Spark handles its own
  * SerializableConfiguration with an explicit Kryo registration in
  * KryoSerializer.registerClasses, which is likewise private). If this
  * engine ever flips the session to Kryo, register a mirroring custom
  * serializer for this class alongside that change.
  */
class SerHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
