package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Public face of Spark's `private[sql]`
  * [[org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback]]
  * — the hook Spark's analyzer and DataStreamWriter use to route
  * STREAMING reads/writes of a V2 catalog table through a V1
  * source/sink (the mechanism table formats with V1 streaming engines
  * use to make `readStream.table` / `writeStream.toTable` work).
  * Bridged here because the trait is `private[sql]`; the contract is
  * one method, `v1Table: CatalogTable`, consulted only on streaming
  * paths.
  */
trait GraftV1FallbackTable extends V2TableWithV1Fallback
